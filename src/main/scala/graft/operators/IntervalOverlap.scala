package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval-overlap analytics without an interval self-join.
  *
  * The naive spelling of "how many sessions overlap session i" is a non-equi
  * self-join (`a.start <= b.end AND b.start <= a.end`) — a broadcast
  * nested-loop at best and O(n²) pairs at 100 TB. Both operators here avoid
  * it with order statistics:
  *
  *   overlaps(i) = |{j : start_j <= end_i}| − |{j : end_j < start_i}| − 1
  *
  * (closed intervals; the −1 removes i itself, which always satisfies both).
  * Each rank count is computed by `countLE` with a bucketized two-level
  * scheme — one tiny per-bucket histogram plus an equi-join on the bucket
  * key for the residual — so the only row-scale shuffles are an aggregate
  * and one equi-join whose fan-out is bounded by points-per-bucket, never a
  * pairwise product and never a global row-level sort.
  *
  * Reference scope: the reference's session analytics stop at per-session
  * aggregates (src/spark/preprocessing.py:63-79); concurrency/overlap is
  * part of the training-pipeline extension set (SURVEY §2.12).
  */
object IntervalOverlap {

  /** For every probe row, count points with `point <= v` (or `< v` when
    * `strict`). Returns `probes` key columns + `outCol` (long).
    *
    * Two-level rank count:
    *   1. bucket histogram: points grouped by `point DIV width` — a table of
    *      O(time-range / width) rows (bounded by the time axis, NOT by data
    *      volume; hours over a decade is < 100k rows).
    *   2. exclusive prefix per probe bucket via one ordered cumsum over the
    *      merged bucket table — the only ordered pass in the operator, and
    *      it runs over O(buckets) rows, not data rows.
    *   3. residual: equi-join probes to the points of their OWN bucket and
    *      count those `<= v` — fan-out is points-per-bucket, tunable with
    *      `width`.
    *
    * `keyCols` must uniquely identify a probe row.
    */
  def countLE(
      probes: DataFrame,
      keyCols: Seq[String],
      probeCol: String,
      points: DataFrame,
      pointCol: String,
      strict: Boolean,
      width: Long,
      outCol: String
  ): DataFrame = {
    require(width > 0, "bucket width must be positive")
    val keyC = keyCols.map(col)

    val pts = points.select(col(pointCol).cast("long").as("_v"))
      .withColumn("_b", expr(s"_v DIV $width"))
    val bucketCounts = pts.groupBy(col("_b")).agg(count(lit(1)).as("_n"))

    val pr = probes.select(keyC :+ col(probeCol).cast("long").as("_pv"): _*)
      .withColumn("_pb", expr(s"_pv DIV $width"))

    // Exclusive prefix per distinct probe bucket: one cumsum over the merged
    // bucket table (bounded by the time axis, so the single-partition window
    // is safe by construction).
    val probeBuckets = pr.select(col("_pb").as("_b")).distinct()
      .withColumn("_isprobe", lit(1))
    val wcum = Window.orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = probeBuckets
      .join(bucketCounts, Seq("_b"), "full_outer")
      .select(col("_b"), coalesce(col("_n"), lit(0L)).as("_n"), col("_isprobe"))
      .withColumn("_prefix", coalesce(sum(col("_n")).over(wcum), lit(0L)))
      .filter(col("_isprobe") === 1)
      .select(col("_b").as("_pb"), col("_prefix"))

    // Residual: same-bucket points <= / < the probe value.
    val cmp = if (strict) col("p._v") < col("pr._pv") else col("p._v") <= col("pr._pv")
    val residual = pr.alias("pr")
      .join(pts.alias("p"), col("p._b") === col("pr._pb"), "left")
      .groupBy(keyC :+ col("pr._pb").as("_pb"): _*)
      .agg(sum(when(cmp, 1L).otherwise(0L)).as("_res"))

    residual
      .join(broadcast(prefix), Seq("_pb"))
      .select(keyC :+ (coalesce(col("_res"), lit(0L)) + col("_prefix")).as(outCol): _*)
  }

  /** Per-interval count of OTHER intervals it overlaps (closed-interval
    * semantics: touching endpoints overlap). `keyCols` identify an interval;
    * start/end columns must be integral (e.g., epoch seconds).
    */
  def overlapCounts(
      intervals: DataFrame,
      keyCols: Seq[String],
      startCol: String,
      endCol: String,
      width: Long = 3600L
  ): DataFrame = {
    val starts = intervals.select(col(startCol))
    val ends = intervals.select(col(endCol))
    val nStartLeEnd =
      countLE(intervals, keyCols, endCol, starts, startCol, strict = false, width, "_n_start_le")
    val nEndLtStart =
      countLE(intervals, keyCols, startCol, ends, endCol, strict = true, width, "_n_end_lt")
    nStartLeEnd
      .join(nEndLtStart, keyCols)
      .select(keyCols.map(col) :+
        (col("_n_start_le") - col("_n_end_lt") - lit(1L)).as("n_overlap"): _*)
  }

  /** Per-bucket boundary deltas: each interval contributes a +start and a
    * +end boundary row, ONE aggregate sums them — (bucket, n_started,
    * n_ended). Single shuffle, and the spelling runs unchanged on a
    * STREAMING frame of closed intervals (one stateful aggregate — no
    * stream-unsupported join); StreamingSpec pins stream ≡ batch.
    */
  def boundaryDeltas(
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      width: Long = 3600L
  ): DataFrame =
    intervals
      .select(explode(array(
        struct(expr(s"CAST($startCol AS BIGINT) DIV $width").as("bucket"),
          lit(1L).as("s"), lit(0L).as("e")),
        struct(expr(s"CAST($endCol AS BIGINT) DIV $width").as("bucket"),
          lit(0L).as("s"), lit(1L).as("e")))).as("b"))
      .groupBy(col("b.bucket").as("bucket"))
      .agg(sum(col("b.s")).as("n_started"), sum(col("b.e")).as("n_ended"))

  /** Concurrency timeline: for each bucket (hour by default) that contains a
    * start or an end, how many intervals started / ended in it and how many
    * are still open after it (cumulative starts − cumulative ends through
    * the bucket; closed intervals, so an interval ending inside bucket h is
    * closed after h).
    *
    * The ONLY ordered pass runs over the per-bucket table — O(time-range /
    * width) rows, so the single-partition window is bounded by the calendar,
    * not the corpus. All row-scale work is one map-side-combining aggregate.
    */
  def concurrencyTimeline(
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      width: Long = 3600L
  ): DataFrame =
    openAfter(boundaryDeltas(intervals, startCol, endCol, width))

  /** Fold the running `n_open_after` prefix over a boundary-delta table.
    * Shared by the batch [[concurrencyTimeline]] and the streaming
    * foreachBatch sink (graft.streaming.ConcurrencySink), where each
    * micro-batch's complete-mode delta table arrives as a plain batch frame.
    * The single-partition window is over the bucket table — bounded by the
    * time axis, not the corpus.
    */
  def openAfter(deltas: DataFrame): DataFrame = {
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas.withColumn("n_open_after",
      sum(col("n_started")).over(w) - sum(col("n_ended")).over(w))
  }
}
