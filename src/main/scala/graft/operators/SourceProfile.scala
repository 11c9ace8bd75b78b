package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-source length-distribution profile — the batch-effect diagnostic a
  * corpus curator runs before mixing sources: decile bins of `n_chars`
  * WITHIN each source (ntile over the deterministic (n_chars, doc_id)
  * order), reporting count, min/max and the exact-ratio mean per bin.
  * Sources whose decile curves diverge need reweighting before training
  * ([[Mixture]] consumes exactly that signal).
  *
  * Determinism: ntile over a total order; bin stats are integers; the
  * mean is one replayed division, floor-6.
  *
  * Scale: one exchange on source for the ntile window, then a map-side
  * rollup on (source, decile) — 10·|sources| cells.
  */
object SourceProfile {

  private def floor6(c: Column): Column =
    floor(c * lit(1000000.0d) + lit(0.5d)) / lit(1000000.0d)

  /** (source, decile, n_docs, min_chars, max_chars, mean_chars). */
  def decileProfile(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("n_chars"), col("doc_id"))
    docs
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("decile", ntile(10).over(w).cast("long"))
      .groupBy("source", "decile")
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        floor6(sum(col("n_chars")).cast("double") / count(lit(1)).cast("double"))
          .as("mean_chars"))
  }
}
