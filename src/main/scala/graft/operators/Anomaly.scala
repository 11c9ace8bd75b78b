package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trailing-window anomaly scoring over a bucketed metric series — the
  * monitoring primitive for event pipelines: per key, each bucket's value
  * is z-scored against the mean/stddev of its previous `trailing` observed
  * buckets, and |z| beyond the threshold flags an anomaly.
  *
  * Scale shape: one partitioned window per key ordered by bucket with a
  * bounded ROWS frame — no global sort, no self-join; the frame holds at
  * most `trailing` rows regardless of series length. Buckets with no row
  * simply don't participate ("previous observed buckets"); compose with
  * [[Densify]] first if absent-as-zero semantics are wanted.
  *
  * Determinism: the flag is computed from the ROUND-6 z on both engines,
  * so the |z| > threshold boundary is explicit and cross-engine identical
  * (q_anomaly_zscore hash-matches, flag included); σ = 0 (constant
  * history) and warm-up (< `minPrev` observations) emit null z, never a
  * division by zero.
  */
object Anomaly {

  def trailingZScores(
      buckets: DataFrame,
      keyCols: Seq[String],
      bucketCol: String,
      valueCol: String,
      trailing: Int = 24,
      minPrev: Int = 12,
      zThreshold: Double = 3.0
  ): DataFrame = {
    require(trailing >= 2 && minPrev >= 2, "need at least 2 trailing observations")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(bucketCol))
      .rowsBetween(-trailing, -1)
    buckets
      .withColumn("trailing_n", count(col(valueCol)).over(w))
      .withColumn("trailing_mean", avg(col(valueCol)).over(w))
      .withColumn("trailing_std", stddev_samp(col(valueCol)).over(w))
      .withColumn("z",
        when(col("trailing_n") >= minPrev && col("trailing_std") > 0.0,
          (col(valueCol) - col("trailing_mean")) / col("trailing_std")))
      .withColumn("is_anomaly",
        coalesce(abs(round(col("z"), 6)) > zThreshold, lit(false)))
  }
}
