package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust (median/MAD) anomaly detection over per-key daily counts — the
  * outlier-resistant complement to the z-score detector: mean/stddev are
  * themselves dragged by the outliers they are supposed to flag (masking),
  * while the median and the Median Absolute Deviation have a 50%
  * breakdown point. A day is anomalous when `|x − med| > 3·MAD` (the
  * Hampel identifier; the 1.4826 normal-consistency constant is folded
  * into the "3" — the flag contract is the doubled-units integer compare
  * below, not a σ estimate).
  *
  * Exactness: counts are integers, so medians live on the DYADIC grid —
  * carried in DOUBLED units (`med_x2 = percentile(2x, ½)` is an integer
  * or an exact .5; deviations `d_x2 = |2x − med_x2|` and their median
  * `mad_x2` stay dyadic), and every comparison is between exactly
  * representable doubles computed by the same interpolation rule in both
  * engines (the q_value_percentiles precedent) — no rounding anywhere.
  *
  * Scale: one (key, day) count aggregate over the scan; the percentile
  * pair runs on the aggregated |keys|·|days| table (bounded, the
  * HoltWinters contract); windows are key-partitioned, never global.
  */
object MadAnomaly {

  /** Per-(key, day) flags. Output: `event_type`, `day`, `n`, `med_x2`,
    * `mad_x2`, `dev_x2`, `is_outlier`.
    */
  def dailyOutliers(events: DataFrame, bucketSeconds: Long = 86400L): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val daily = events
      .groupBy(col("event_type"),
        expr(s"CAST(ts AS LONG) DIV $bucketSeconds").as("day"))
      .agg(count(lit(1)).as("n"))
    val med = daily.groupBy(col("event_type"))
      .agg(percentile(col("n") * lit(2L), lit(0.5)).as("med_x2"))
    val dev = daily.join(med, Seq("event_type"))
      .withColumn("dev_x2", abs(col("n") * lit(2L) - col("med_x2")))
    val mad = dev.groupBy(col("event_type"))
      .agg(percentile(col("dev_x2"), lit(0.5)).as("mad_x2"))
    dev.join(mad, Seq("event_type"))
      .select(col("event_type"), col("day"), col("n"),
        col("med_x2"), col("mad_x2"), col("dev_x2"),
        (col("dev_x2") > lit(3.0) * col("mad_x2")).as("is_outlier"))
  }
}
