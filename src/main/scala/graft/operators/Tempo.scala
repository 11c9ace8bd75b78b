package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal-rhythm rollups over the event stream — the two reports a
  * growth/capacity dashboard pairs: WHEN traffic lands (hour-of-week
  * matrix) and HOW OFTEN buyers come back (inter-purchase gap
  * distribution).
  *
  * Determinism: day-of-week is pure epoch-day arithmetic ((d+3) % 7,
  * 0 = Monday — the RankTest spelling, never engine dayofweek numbering);
  * gaps are exact micros differences bucketed by integer division; share
  * is one replayed double division, floor-6.
  *
  * Scale: the matrix is a map-side-combinable rollup to ≤168 cells; the
  * gap report is one exchange on user_id for the lag window, then a tiny
  * histogram rollup.
  */
object Tempo {

  /** (dow, hour_of_day, n_events, share) — 0=Monday; share of all events. */
  def hourOfWeekProfile(events: DataFrame): DataFrame = {
    val cell = events.select(
      expr("(CAST(ts AS LONG) DIV 86400 + 3) % 7").as("dow"),
      expr("(CAST(ts AS LONG) DIV 3600) % 24").as("hour_of_day"))
    val ag = cell.groupBy("dow", "hour_of_day").agg(count(lit(1)).as("n_events"))
    ag.withColumn(
      "share",
      floor(
        col("n_events").cast("double")
          / sum(col("n_events")).over(Window.partitionBy()).cast("double")
          * lit(1000000.0d) + lit(0.5d)) / lit(1000000.0d))
  }

  /** (gap_hours, n_gaps) — histogram of consecutive same-user purchase
    * gaps, bucketed to whole hours (floor). Users with one purchase
    * contribute nothing.
    */
  def repurchaseGaps(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    events
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("ts_ns DIV 1000").as("ts_us"), col("event_id"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
      .where(col("prev_us").isNotNull)
      .groupBy(expr("(ts_us - prev_us) DIV 3600000000").as("gap_hours"))
      .agg(count(lit(1)).as("n_gaps"))
  }
}
