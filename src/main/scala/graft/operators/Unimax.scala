package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** UniMax budget allocation (Chung, Garcia, Roberts et al. 2023, "UniMax:
  * Fairer and More Effective Language Sampling for Large-Scale Multilingual
  * Pretraining"): distribute a total token budget as uniformly as possible
  * across sources, capping each source at `maxEpochs` passes over its data —
  * the mixture rule that avoids both temperature sampling's head bias and
  * the tail over-epoching that memorizes small sources.
  *
  * The iterative waterfill has a closed relational form: sort sources by
  * cap = size·maxEpochs ascending; a source is capped iff
  * cap_k · (n−k+1) ≤ B − cum_{k−1}, and that predicate is monotone in k
  * (if it fails at k it fails at every later k — each failure strictly
  * shrinks the residual-per-remaining bound), so the capped set is a PREFIX
  * and kstar = the count of true predicates. Uncapped sources split the
  * residual exactly: floor(R/m) each, with the R mod m remainder going +1
  * to the lexicographically first uncapped sources — every step exact
  * BIGINT arithmetic, no floats anywhere.
  *
  * Scale shape: one groupBy aggregate over the corpus, then every window
  * runs on the |sources|-row summary (the [[RobustTrend]] bounded-table
  * contract) — nothing unpartitioned ever touches corpus-sized data.
  */
object Unimax {

  /** Per-source allocation: `source, size, cap, alloc` (alloc ≤ cap,
    * Σ alloc = min(B, Σ cap)). `sizeCol` is the per-row weight the budget
    * is denominated in (tokens, chars, bytes).
    */
  def allocate(
      df: DataFrame,
      budget: Long,
      maxEpochs: Int = 2,
      sourceCol: String = "source",
      sizeCol: String = "n_chars"
  ): DataFrame = {
    require(budget >= 0 && maxEpochs >= 1)
    val sizes = df
      .groupBy(col(sourceCol).as("source"))
      .agg(sum(col(sizeCol).cast("long")).as("size"))
      .select(col("source"), col("size"), (col("size") * maxEpochs).as("cap"))
    val byCap = Window.orderBy(col("cap"), col("source"))
    val ranked = sizes
      .withColumn("k", row_number().over(byCap))
      .withColumn("cum", sum(col("cap")).over(byCap.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n", count(lit(1)).over(Window.partitionBy()))
      // capped iff the uniform share among sources k..n still exceeds cap_k
      .withColumn("is_capped",
        col("cap") * (col("n") - col("k") + 1) <= lit(budget) - (col("cum") - col("cap")))
      .withColumn("kstar", sum(when(col("is_capped"), 1L).otherwise(0L)).over(Window.partitionBy()))
      .withColumn("capped_sum",
        sum(when(col("is_capped"), col("cap")).otherwise(0L)).over(Window.partitionBy()))
    // remainder goes +1 to the lexicographically first uncapped sources
    val uncappedRank = row_number().over(
      Window.partitionBy(col("is_capped")).orderBy(col("source")))
    ranked
      .withColumn("ur", uncappedRank)
      .withColumn("m", col("n") - col("kstar"))
      .withColumn("residual", lit(budget) - col("capped_sum"))
      .select(
        col("source"), col("size"), col("cap"),
        when(col("is_capped"), col("cap"))
          .otherwise(
            expr("residual DIV m")
              + when(col("ur") <= pmod(col("residual"), col("m")), 1L).otherwise(0L))
          .as("alloc"))
  }
}
