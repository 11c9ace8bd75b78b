package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join that PLANS AS AN EQUI-JOIN.
  *
  * Spark's native plan for `p.join(i, point BETWEEN lo AND hi)` is a
  * BroadcastNestedLoopJoin (or a cartesian product when neither side fits
  * in a broadcast) — O(|points|·|intervals|) comparisons, unusable at
  * scale. The standard fix: quantize the axis into buckets of `width`,
  * explode each interval to the buckets it spans, map each point to its
  * single bucket, equi-join on the bucket key, and keep the residual
  * BETWEEN as a post-join filter. Each qualifying pair is produced exactly
  * once (a point lives in exactly one bucket), so no dedup is needed.
  *
  * Cost: one shuffle per side on the bucket key; interval-side row
  * multiplication = span/width + 1 (choose `width` near the median span).
  * A pathological interval spanning more than `maxBucketsPerInterval`
  * buckets fails fast with raise_error rather than silently exploding the
  * job — at 100 TB that is a data-quality signal, not a plan problem.
  *
  * [[IntervalOverlap]] covers the COUNTING cases without materializing
  * pairs; this operator is for when the pairs themselves are the output.
  */
object RangeJoin {

  /** `keyCols` (present on BOTH sides) add an equi-key to the bucket join —
    * the keyed variant: "match each point to this key's intervals" (events
    * to their session, trades to their order's window). The shuffle key
    * becomes (keys..., bucket), so per-key interval skew spreads over the
    * bucket axis too.
    */
  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      width: Long,
      maxBucketsPerInterval: Long = 100000L,
      keyCols: Seq[String] = Nil
  ): DataFrame = {
    require(width > 0, "bucket width must be positive")
    val ib = intervals
      .withColumn("_lb", expr(s"CAST($loCol AS BIGINT) DIV $width"))
      .withColumn("_hb", expr(s"CAST($hiCol AS BIGINT) DIV $width"))
      .withColumn("_hb",
        when(col("_hb") - col("_lb") >= maxBucketsPerInterval, raise_error(concat(
          lit(s"RangeJoin: interval spans more than $maxBucketsPerInterval buckets of $width: "),
          col(loCol).cast("string"), lit(".."), col(hiCol).cast("string"))))
          .otherwise(col("_hb")))
      .withColumn("_b", explode(sequence(col("_lb"), col("_hb"))))
      .drop("_lb", "_hb")
    val pb = points.withColumn("_b", expr(s"CAST($pointCol AS BIGINT) DIV $width"))
    pb.join(ib, Seq("_b") ++ keyCols)
      .filter(col(pointCol).cast("long").between(
        col(loCol).cast("long"), col(hiCol).cast("long")))
      .drop("_b")
  }
}
