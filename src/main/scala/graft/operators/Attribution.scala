package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Money

/** Linear multi-touch attribution — every view a user made in the
  * `windowSecs` before one of their purchases shares that purchase's value
  * EQUALLY (the classic "linear" model, vs the as-of join's last-touch).
  *
  * Determinism: the time axis is exact micros (`ts_ns DIV 1000`, the
  * DuckDB-truncation-safe spelling); the per-view credit is integer
  * floor division of the purchase's integer micros value by the window's
  * view count (all operands non-negative, where Spark `DIV` ≡ DuckDB `//`),
  * the dropped remainder dropping identically in both engines; report
  * sums are integer micros through [[Money]].
  *
  * Scale: the purchase×view pairing is an equi-join on `user_id` (both
  * sides co-partitioned by the shuffle) with the window predicate applied
  * at the join — per-user fan-out is bounded by per-user activity, the
  * same skew envelope as the sessionization operators; everything after
  * is map-side-combinable integer aggregation.
  */
object Attribution {

  /** (hour_of_day, n_credited_views, attributed_money) — credit rollup by
    * the crediting VIEW's UTC hour of day.
    */
  def linearByHour(events: DataFrame, windowSecs: Long = 86400L): DataFrame = {
    // The integer-DIV credit split below is only engine-portable for
    // non-negative operands (Spark DIV truncates toward zero, DuckDB //
    // floors) — enforce the invariant instead of assuming it, so a refund
    // row (negative value) is excluded rather than silently hash-diverging.
    val p = events
      .filter(col("event_type") === "purchase" && col("value") >= 0)
      .select(
        col("user_id"),
        col("event_id").as("purchase_id"),
        expr("ts_ns DIV 1000").as("p_us"),
        round(col("value") * lit(1e6), 0).cast("long").as("value_micros"))
    val v = events
      .filter(col("event_type") === "view")
      .select(col("user_id"), expr("ts_ns DIV 1000").as("v_us"))
    val win = Window.partitionBy(col("purchase_id"))
    p.join(v, Seq("user_id"))
      .filter(
        col("v_us") < col("p_us") &&
          col("v_us") >= col("p_us") - lit(windowSecs * 1000000L))
      .withColumn("n_views", count(lit(1)).over(win))
      .withColumn("credit_micros", expr("value_micros DIV n_views"))
      .groupBy(expr("(v_us DIV 3600000000) % 24").as("hour_of_day"))
      .agg(
        count(lit(1)).as("n_credited_views"),
        Money.microsToMoney(sum(col("credit_micros"))).as("attributed_money"))
  }
}
