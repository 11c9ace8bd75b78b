package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Money

/** RFM segmentation — the classic marketing rollup: per purchasing user,
  * Recency (last purchase time), Frequency (purchase count), Monetary
  * (exact integer-micros spend), each quartiled with `ntile(4)` under a
  * fully deterministic (metric, user_id) ordering; segment code
  * R·100 + F·10 + M; report user counts and total spend per segment.
  *
  * Determinism: every metric is an exact integer; ntile over a total
  * order is engine-identical (equal buckets, earlier buckets take the
  * remainder); money goes through [[Money]] integer micros.
  *
  * Scale: one groupBy(user) rollup; the three ntile windows sort the
  * per-user rollup (users ≪ events) — at cluster scale a range-partitioned
  * sort each, or replaceable by percentile-threshold joins if the user
  * dimension ever rivals the fact table.
  */
object Rfm {

  /** (segment, n_users, total_money) — one row per occupied RFM cell. */
  def segments(events: DataFrame): DataFrame = {
    val pu = events
      .filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(
        max(expr("CAST(ts AS LONG)")).as("rec_s"),
        count(lit(1)).as("freq"),
        Money.microsSum(col("value")).as("mon"))
    def quart(c: String) =
      ntile(4).over(Window.orderBy(col(c), col("user_id"))).cast("long")
    pu.select(
        col("user_id"),
        col("mon"),
        (quart("rec_s") * lit(100L) + quart("freq") * lit(10L) + quart("mon"))
          .as("segment"))
      .groupBy("segment")
      .agg(
        count(lit(1)).as("n_users"),
        Money.microsToMoney(sum(col("mon"))).as("total_money"))
  }
}
