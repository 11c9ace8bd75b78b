package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact two-sample Kolmogorov–Smirnov statistic — the nonparametric
  * continuous-distribution drift test next to [[Psi]]'s bucketed one:
  * D = max over distinct values v of |F₀(v) − F₁(v)|, which over exact
  * counts is pure integer arithmetic:
  *
  *   D·n₀·n₁ = max over v of |c₀(v)·n₁ − c₁(v)·n₀|
  *
  * with c the cumulative per-arm counts in value order. No float ever
  * aggregates; the reported `d_e6` is one integer floor division.
  *
  * Scale shape: one map-side-combined aggregate to the distinct-value
  * table, then TWO [[PrefixSum]] passes for the cumulative counts (never
  * a single-partition global window), a broadcast totals join, and a
  * 1-row max.
  */
object KsTest {

  /** 1 row: `(n0, n1, d_num, d_e6)` where `d_num = D·n0·n1` exactly and
    * `d_e6 = ⌊d_num·10⁶ / (n0·n1)⌋`. `valueCol` must be integer-valued
    * (quantize doubles to micros first — lossless for round-6 series) and
    * non-null; `armCol` 0/1. Requires n0·n1·10⁶ < 2⁶³ and both arms
    * non-empty.
    */
  def twoSample(df: DataFrame, valueCol: String, armCol: String): DataFrame = {
    val rows = df.select(col(valueCol).cast("long").as("x"),
      col(armCol).cast("long").as("a"))
      .where(col("x").isNotNull)
    val agg = rows.groupBy(col("x"))
      .agg(sum(when(col("a") === 0L, 1L).otherwise(0L)).as("a0"),
        sum(when(col("a") === 1L, 1L).otherwise(0L)).as("a1"))
    val cum = PrefixSum.runningTotal(
      PrefixSum.runningTotal(agg, Seq("x"), "a0", "c0"),
      Seq("x"), "a1", "c1")
    val tot = rows.agg(
      sum(when(col("a") === 0L, 1L).otherwise(0L)).as("n0"),
      sum(when(col("a") === 1L, 1L).otherwise(0L)).as("n1"))
    cum.crossJoin(broadcast(tot))
      .select(abs(col("c0") * col("n1") - col("c1") * col("n0")).as("dn"),
        col("n0"), col("n1"))
      .groupBy(col("n0"), col("n1"))
      .agg(max(col("dn")).as("d_num"))
      .select(col("n0"), col("n1"), col("d_num"),
        expr("d_num * 1000000 DIV (n0 * n1)").as("d_e6"))
  }
}
