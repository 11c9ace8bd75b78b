package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Split conformal prediction (Vovk et al. 2005; Lei et al. 2018) for a
  * regression target, fully deterministic: the three-way split is the
  * portable md5-48 content hash (never engine RNG), the point model is a
  * per-group integer-micros mean, nonconformity scores are exact BIGINT
  * absolute residuals, and q̂ is the exact ⌈(n+1)(1−α)⌉-th smallest score —
  * so the finite-sample marginal guarantee P(|y−ŷ| ≤ q̂) ≥ 1−α holds by
  * construction and the whole calibration replays in any engine.
  *
  * Scale shape: the exact order statistic is computed WITHOUT a per-group
  * row sort — scores collapse to a (group, score) count table first (one
  * map-side-combined shuffle), and the cumulative rank runs over that
  * aggregated table (bounded by the score domain, not the row count) — the
  * established PrefixSum-over-aggregates discipline. The per-group model
  * and q̂ tables are group-cardinality-sized and broadcast into the test
  * scan.
  */
object Conformal {

  /** One row per group present in both calibration and test splits:
    * `(group_key, n_cal, n_test, qhat_micros, covered, coverage_e6)`.
    * `qhat_micros = -1` is the r > n_cal "infinite interval" sentinel
    * (every test row counts covered). Coverage target is
    * `coverNum/coverDen` (default 9/10 → α = 0.1).
    */
  def splitConformal(
      df: DataFrame,
      keyCol: String,
      yCol: String,
      groupCol: String,
      coverNum: Long = 9L,
      coverDen: Long = 10L
  ): DataFrame = {
    require(coverNum >= 0 && coverDen > 0 && coverNum <= coverDen, "cover must be in [0,1]")
    val base = df.select(col(groupCol).as("g"), col(yCol).cast("long").as("y"),
      (HashSplit.md548(col(keyCol)) % 4).as("b"))
    val model = base.where(col("b") <= 1)
      .groupBy("g").agg(sum("y").as("sy"), count(lit(1)).as("n_train"))
      .selectExpr("g", "sy * 1000000 DIV n_train AS yhat_micros")
    val cal = base.where(col("b") === 2).join(broadcast(model), "g")
      .select(col("g"), abs(col("y") * 1000000L - col("yhat_micros")).as("s"))
    val rk = cal.groupBy("g").agg(count(lit(1)).as("n_cal"))
      .selectExpr("g", "n_cal",
        s"($coverNum * (n_cal + 1) + ($coverDen - 1)) DIV $coverDen AS r")
    val w = Window.partitionBy("g").orderBy("s")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = cal.groupBy("g", "s").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum("c").over(w))
    val qhat = cum.join(broadcast(rk), "g").where(col("cum") >= col("r"))
      .groupBy("g").agg(min("s").as("qhat_micros"))
    base.where(col("b") === 3)
      .join(broadcast(model), "g")
      .join(broadcast(rk.select("g", "n_cal")), "g")
      .join(broadcast(qhat), Seq("g"), "left")
      .select(col("g"), col("n_cal"), col("qhat_micros"),
        (col("qhat_micros").isNull
          || abs(col("y") * 1000000L - col("yhat_micros")) <= col("qhat_micros")).as("cov"))
      .groupBy(col("g").as("group_key"), col("n_cal"))
      .agg(count(lit(1)).as("n_test"),
        coalesce(first(col("qhat_micros")), lit(-1L)).as("qhat_micros"),
        sum(when(col("cov"), 1L).otherwise(0L)).as("covered"))
      .withColumn("coverage_e6",
        floor(col("covered").cast("double") * lit(1000000.0d)
          / col("n_test").cast("double")).cast("long"))
  }
}
