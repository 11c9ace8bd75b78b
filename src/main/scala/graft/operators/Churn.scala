package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Daily churn / acquisition ledger — for every active day: how many users
  * were active, how many were NEW (not active the previous day), how many
  * RETAINED into the next day, and how many CHURNED after it (not active
  * the next day). The day-granularity engagement report every growth
  * dashboard starts from.
  *
  * Contract edges are deterministic: a user's first-ever day counts as
  * new; the corpus' last day counts every active user as churned (lead is
  * null). All outputs are exact integers.
  *
  * Scale: one distinct projection to (user, day), ONE exchange on user_id
  * for both lag and lead, then a map-side-combinable rollup on day — the
  * day key space is tiny.
  */
object Churn {

  /** (d, n_active, n_new, n_retained, n_churned) per active day. */
  def dailyLedger(events: DataFrame): DataFrame = {
    val ud = events
      .select(col("user_id"), expr("CAST(ts AS LONG) DIV 86400").as("d"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("d"))
    ud.withColumn("prev", lag(col("d"), 1).over(w))
      .withColumn("next", lead(col("d"), 1).over(w))
      .groupBy("d")
      .agg(
        count(lit(1)).as("n_active"),
        sum(when(col("prev").isNull || col("prev") < col("d") - 1, 1L).otherwise(0L))
          .as("n_new"),
        sum(when(col("next") === col("d") + 1, 1L).otherwise(0L)).as("n_retained"),
        sum(when(col("next").isNull || col("next") > col("d") + 1, 1L).otherwise(0L))
          .as("n_churned"))
  }
}
