package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Selection-rate bias audit for curation filters — the four-fifths
  * (disparate-impact) readout applied to a keep/drop decision across
  * corpus slices: per group, how many documents survived the filter, the
  * survival rate, and that rate relative to the best-surviving group. A
  * quality gate that silently drops 60% of one source while keeping 95%
  * of another reshapes the training mixture; this makes the skew a
  * first-class, hash-checkable table instead of a surprise in the
  * post-hoc mixture report.
  *
  * Exactness: rates are `floor(n_keep·10⁶ / n_docs)` micros (one IEEE
  * division of exact integers, floored), the impact ratio is
  * `floor(rate·10⁶ / max_rate)` of those integers, and the flag is an
  * integer compare against 800 000 — no doubles in any aggregate, every
  * row replayable.
  *
  * Scale shape: one aggregate on the group key over the (id, keep) join;
  * the 1-row max-rate frame broadcasts. Group count = slice count —
  * metadata-sized output.
  */
object CurationBias {

  /** Per-group selection audit. `flags` must carry `idCol` and a boolean
    * `keep`. Output: `grp`, `n_docs`, `n_keep`, `keep_rate_e6`,
    * `impact_e6` (vs the best group), `four_fifths_ok`.
    */
  def selectionRates(
      docs: DataFrame,
      flags: DataFrame,
      groupCol: String,
      idCol: String = "doc_id"
  ): DataFrame = {
    val rates = docs.select(col(idCol), col(groupCol).as("grp"))
      .join(flags.select(col(idCol), col("keep")), Seq(idCol))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"))
      .select(col("grp"), col("n_docs"), col("n_keep"),
        floor(col("n_keep").cast("double") * lit(1000000.0) / col("n_docs"))
          .cast("long").as("keep_rate_e6"))
    val best = rates.agg(max(col("keep_rate_e6")).as("_best"))
    rates.crossJoin(broadcast(best))
      .select(col("grp"), col("n_docs"), col("n_keep"), col("keep_rate_e6"),
        // _best = 0 (nothing survives anywhere) reports NULL, not a
        // divide-by-zero under ANSI
        when(col("_best") > 0,
          floor(col("keep_rate_e6").cast("double") * lit(1000000.0) / col("_best"))
            .cast("long")).as("impact_e6"))
      .withColumn("four_fifths_ok", col("impact_e6") >= 800000L)
  }
}
