package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classical additive seasonal decomposition — v = trend + seasonal +
  * residual, the moving-average method (the STL ancestor): trend is a
  * centered `period`-wide moving mean (null where the window is
  * incomplete), the seasonal component is the mean DETRENDED value per
  * cycle phase (bucket mod period), and the residual is what's left.
  * The monitoring primitive behind "is this dip a daily rhythm or an
  * incident": [[Anomaly]] z-scores the raw series; this separates the
  * rhythm out first.
  *
  * Scale shape: the input is a PRE-AGGREGATED series — one row per time
  * bucket, bounded by the time axis, not the fact table (the
  * IntervalOverlap bucket-table adjudication) — so the global
  * `Window.orderBy` sort is over a bounded frame by construction. The
  * phase aggregate and join are |period|-bounded.
  *
  * Numeric discipline: window/group aggregation of doubles diverges
  * across engines beyond rounding control (running sums vs segment
  * trees — a real red cell found here), so NO float is ever aggregated:
  * the round-6 input series converts LOSSLESSLY to integer micros
  * (v·10⁶ is exact for a round-6 value), the trend window and the phase
  * aggregate sum exact integers, and the only floats are final identical
  * IEEE divisions of identical integers, emitted through the
  * floor(x·10⁶ + 0.5) spelling (the Densify.interpolate lesson about
  * library round() half-boundary semantics).
  */
object Seasonal {

  private def floor6(c: Column): Column =
    floor(c * lit(1e6) + lit(0.5)) / lit(1e6)

  /** @param series one row per bucket: (bucketCol integral, valueCol).
    * @return (bucket, phase, value, trend, seasonal, resid) — trend null
    *         on the `period`-incomplete edges, resid null wherever trend
    *         or seasonal is.
    */
  def decompose(
      series: DataFrame,
      bucketCol: String,
      valueCol: String,
      period: Int = 24
  ): DataFrame = {
    require(period >= 2, "Seasonal.decompose: period must be >= 2")
    val half = period / 2
    val w = Window.orderBy(col(bucketCol)).rowsBetween(-half, period - half - 1)
    val denom = lit(period * 1e6)
    val withTrend = series
      .withColumn("_vi", round(col(valueCol) * lit(1e6)).cast("long"))
      .withColumn("_tsum",
        when(count(col("_vi")).over(w) === period, sum(col("_vi")).over(w)))
      .withColumn("trend", floor6(col("_tsum").cast("double") / denom))
      .withColumn("phase", pmod(col(bucketCol), lit(period)).cast("long"))
      .withColumn("_det", lit(period) * col("_vi") - col("_tsum"))
    val seas = withTrend
      .filter(col("_tsum").isNotNull)
      .groupBy(col("phase"))
      .agg(sum(col("_det")).as("_ssum"), count(lit(1)).as("_scnt"))
      .select(col("phase"),
        floor6(col("_ssum").cast("double") / (col("_scnt") * denom)).as("seasonal"))
    withTrend
      .join(seas, Seq("phase"), "left")
      .withColumn("resid",
        floor6(col(valueCol) - col("trend") - col("seasonal")))
      .select(col(bucketCol), col("phase"), col(valueCol),
        col("trend"), col("seasonal"), col("resid"))
  }
}
