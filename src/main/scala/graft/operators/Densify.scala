package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series densification: turn a sparse per-(group, bucket) frame into a
  * regular one — every bucket between each group's first and last
  * observation exists, absent buckets zero-filled, and carried metrics
  * forward-filled (`last IGNORE NULLS`).
  *
  * Scale shape: the spine explodes `sequence(lo, hi)` PER GROUP, so row
  * growth is each group's own active span (never the global calendar), and
  * every shuffle in the pipeline hashes on the group key family — the spine
  * aggregate, the left join back, and the fill window. Feature pipelines
  * need this before any fixed-stride temporal model (lag features, rolling
  * windows over regular grids); the reference has no counterpart
  * (SURVEY §2.12 extension).
  */
object Densify {

  /** Per-group regular bucket spine: one row per (group, bucket) for every
    * bucket in [min observed, max observed] of that group. `bucketCol` must
    * be integral.
    */
  def spine(df: DataFrame, groupCol: String, bucketCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(min(col(bucketCol)).as("_lo"), max(col(bucketCol)).as("_hi"))
      .select(col(groupCol), explode(sequence(col("_lo"), col("_hi"))).as(bucketCol))

  /** Forward-fill `fillCols` within each group in `orderCol` order. Rows
    * before a group's first non-null value stay null.
    */
  def forwardFill(
      df: DataFrame,
      groupCol: String,
      orderCol: String,
      fillCols: Seq[String]
  ): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fillCols.foldLeft(df) { (acc, c) =>
      acc.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
  }

  /** Densify + zero-fill counts + forward-fill carried metrics in one call.
    * `counts` are coalesced to 0 on spine-only rows; `carried` are
    * forward-filled.
    */
  def densify(
      agg: DataFrame,
      groupCol: String,
      bucketCol: String,
      counts: Seq[String],
      carried: Seq[String]
  ): DataFrame = {
    val sp = spine(agg, groupCol, bucketCol)
    val joined = sp.join(agg, Seq(groupCol, bucketCol), "left")
    val zeroed = counts.foldLeft(joined) { (acc, c) =>
      acc.withColumn(c, coalesce(col(c), lit(0L)))
    }
    forwardFill(zeroed, groupCol, bucketCol, carried)
  }

  /** Linear interpolation of `valueCol` across null gap rows: a gap row
    * between observed neighbors (pb, pv) and (nb, nv) gets
    * pv + (nv − pv) · (b − pb)/(nb − pb); rows before a group's first or
    * after its last observation stay null (no extrapolation). Both
    * direction windows share ONE partitioning and sort (backward last +
    * forward first over the same (group, bucket) order), so the whole
    * fill costs a single exchange. Output column `<valueCol>_interp`,
    * rounded to `roundTo` decimals via the explicit floor(x·10^r + 0.5)
    * spelling, NOT the round() builtin: interpolated values are dense
    * rationals that can land within an ulp of a decimal half-boundary,
    * where Spark's BigDecimal HALF_UP and DuckDB's scaled-double round()
    * disagree — floor/multiply/add are plain IEEE ops both engines
    * evaluate identically on identical inputs.
    */
  def interpolate(
      df: DataFrame,
      groupCol: String,
      bucketCol: String,
      valueCol: String,
      roundTo: Int = 6
  ): DataFrame = {
    val wb = Window.partitionBy(col(groupCol)).orderBy(col(bucketCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // The forward look runs as a RUNNING `last` over the reverse sort, not
    // `first` over a (currentRow, unboundedFollowing) frame: Spark executes
    // shrinking frames by re-aggregating the remainder per row — O(n²) per
    // partition (measured 25 s on a ~700-row-per-group sf0.1 series vs
    // ~1 s this way). Same hash partitioning, so still ONE exchange; the
    // second in-partition sort is O(n log n).
    val wfRev = Window.partitionBy(col(groupCol)).orderBy(col(bucketCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val v = col(valueCol)
    val b = col(bucketCol)
    val obsBucket = when(v.isNotNull, b)
    val prevV = last(v, ignoreNulls = true).over(wb)
    val prevB = last(obsBucket, ignoreNulls = true).over(wb)
    val nextV = last(v, ignoreNulls = true).over(wfRev)
    val nextB = last(obsBucket, ignoreNulls = true).over(wfRev)
    val raw = when(v.isNotNull, v)
      .when(prevV.isNotNull && nextV.isNotNull,
        prevV + (nextV - prevV) *
          ((b - prevB).cast("double") / (nextB - prevB)))
    val scale = lit(math.pow(10.0, roundTo))
    df.withColumn(s"${valueCol}_interp", floor(raw * scale + lit(0.5)) / scale)
  }
}
