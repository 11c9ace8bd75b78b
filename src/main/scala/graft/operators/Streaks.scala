package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Activity streaks — the classic gaps-and-islands: each user's maximal
  * runs of CONSECUTIVE active days (island id = day − dense position, the
  * textbook trick), rolled up to a histogram of per-user longest streaks.
  *
  * Determinism: everything is integer day arithmetic on a distinct
  * (user, day) projection.
  *
  * Scale: one exchange on user_id serves the position window, the island
  * rollup and the per-user max (same-key aggregations reuse the
  * partitioning); the histogram key space is tiny.
  */
object Streaks {

  /** (streak_days, n_users) — distribution of each user's longest run. */
  def maxStreakHistogram(events: DataFrame): DataFrame = {
    val ud = events
      .select(col("user_id"), expr("CAST(ts AS LONG) DIV 86400").as("d"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("d"))
    ud.withColumn("isl", col("d") - row_number().over(w).cast("long"))
      .groupBy("user_id", "isl")
      .agg(count(lit(1)).as("len"))
      .groupBy("user_id")
      .agg(max(col("len")).as("streak_days"))
      .groupBy("streak_days")
      .agg(count(lit(1)).as("n_users"))
  }
}
