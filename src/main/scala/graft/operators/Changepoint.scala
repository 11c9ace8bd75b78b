package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Offline changepoint detection — the best single mean-shift split of the
  * hourly event-count series: argmax over split positions t of
  * |mean(x₁..xₜ) − mean(xₜ₊₁..x_T)| (the T=1 case of binary segmentation /
  * least-squares changepoint, computable from prefix sums alone).
  *
  * Determinism: the series is exact integer counts on the observed hour
  * buckets (ordered, gaps irrelevant to the split semantics); prefix sums
  * are windowed BIGINT sums; the split statistic is one double expression
  * over exact integers — identical IEEE on both engines, so even the
  * float argmax ordering agrees bit-for-bit; ties break on the earlier
  * split. Output means use the floor(x·10⁶+0.5) spelling.
  *
  * Scale: the hourly rollup is a map-side-combined groupBy; the series
  * itself (hours, not events) is tiny at any SF, so the single-partition
  * prefix-sum window over it is a bounded post-rollup step — the same
  * shape as the seasonal/trend operators.
  */
object Changepoint {

  private def floor6(c: Column): Column =
    floor(c * lit(1000000.0d) + lit(0.5d)) / lit(1000000.0d)

  /** One row: (split_hour, t_split, mean_before, mean_after, gap) — the
    * hour bucket AFTER which the split falls, its 1-based index, and the
    * two segment means.
    */
  def bestMeanShift(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(expr("CAST(ts AS LONG) DIV 3600").as("h"))
      .agg(count(lit(1)).as("c"))
    val w = Window.orderBy(col("h"))
    val all = Window.partitionBy()
    val series = hourly.select(
      col("h"),
      row_number().over(w).cast("long").as("t"),
      sum(col("c")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("ps"),
      sum(col("c")).over(all).as("tot"),
      count(lit(1)).over(all).as("tt"))
    val mb = col("ps").cast("double") / col("t").cast("double")
    val ma = (col("tot") - col("ps")).cast("double") / (col("tt") - col("t")).cast("double")
    series
      .where(col("t") < col("tt"))
      .select(col("h"), col("t"), mb.as("mb"), ma.as("ma"), abs(mb - ma).as("gap"))
      .withColumn("rk", row_number().over(Window.orderBy(col("gap").desc, col("t"))))
      .where(col("rk") === 1)
      .select(
        col("h").as("split_hour"),
        col("t").as("t_split"),
        floor6(col("mb")).as("mean_before"),
        floor6(col("ma")).as("mean_after"),
        floor6(col("gap")).as("gap"))
  }
}
