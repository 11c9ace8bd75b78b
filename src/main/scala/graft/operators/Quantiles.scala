package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated per-group percentiles with an ENGINE-PORTABLE
  * spelling — the funnel time-to-convert / latency-SLO summary operator.
  *
  * Why not `percentile()` / `quantile_cont()`: both implement linear
  * interpolation, but each engine's `a + f·(b−a)` evaluation order and
  * internal accumulation differ, and on large-magnitude integer inputs
  * (microsecond gaps ~1e10) one ulp exceeds the round-6 grid, so no
  * output rounding can reconcile them. This operator instead RANKS the
  * values (one window exchange) and computes the interpolation from the
  * two bracketing ranked elements with explicit integer position math —
  * rem = ((n−1)·p) mod 100, lo = floor(((n−1)·p)/100) — so every float
  * op is the same IEEE expression on any engine that replays it, and the
  * result needs no rounding at all.
  *
  * Scale shape: one hash exchange on the group key; the rank window and
  * the count window share it (stacked Window operators, the [[Funnel]]
  * plan shape). Ties are interchangeable under ranking, so row_number's
  * arbitrary tie order cannot change any percentile.
  */
object Quantiles {

  /** One row per group: `n` plus a `p{P}` column per requested integer
    * percentile P, each the exact linear interpolation over the sorted
    * non-null `valueCol` (cast to long).
    */
  def byGroup(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      pcts: Seq[Int]
  ): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 0 && p <= 100),
      "Quantiles.byGroup: percentiles must be integers in [0, 100]")
    val wRank = Window.partitionBy(col("gq_g")).orderBy(col("v"))
    val ranked = df
      .filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("gq_g"), col(valueCol).cast("long").as("v"))
      .withColumn("rn", row_number().over(wRank).cast("long") - 1)
      .withColumn("nn", count(lit(1)).over(Window.partitionBy(col("gq_g"))))
    def loPos(p: Int): Column =
      floor(((col("nn") - 1) * p) / lit(100.0).cast("double")).cast("long")
    val aggs = pcts.flatMap { p =>
      Seq(
        max(when(col("rn") === loPos(p), col("v"))).as(s"a$p"),
        max(when(col("rn") === least(loPos(p) + 1, col("nn") - 1), col("v")))
          .as(s"b$p"))
    }
    val out = ranked
      .groupBy(col("gq_g"))
      .agg(count(lit(1)).as("n"), aggs: _*)
    val qCols = pcts.map { p =>
      val rem = ((col("n") - 1) * p) % 100
      (col(s"a$p").cast("double") +
        rem / lit(100.0).cast("double") * (col(s"b$p") - col(s"a$p")))
        .as(s"p$p")
    }
    out.select(col("gq_g").as(groupCol) +: col("n") +: qCols: _*)
  }
}
