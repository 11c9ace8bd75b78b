package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Money

/** Pareto revenue concentration — the "top X% of users drive Y% of
  * revenue" report ([[Concentration]]'s Gini gives the scalar; this gives
  * the curve at the standard cutoffs).
  *
  * Contract: users rank by spend DESC (user_id tie-break); the top-p%
  * head is `greatest(1, (n·p) DIV 100)` users (integer floor, never
  * empty); share = head micros / total micros — one double division of
  * exact integers, floor-6.
  *
  * Scale: the rank + cumulative windows run on the per-user rollup
  * (users ≪ events), one exchange; the cutoff probe is a tiny broadcast
  * semi-join, not a driver loop.
  */
object Pareto {

  private def floor6(c: Column): Column =
    floor(c * lit(1000000.0d) + lit(0.5d)) / lit(1000000.0d)

  /** (pct, k_users, head_money, share) for pct ∈ pcts. */
  def revenueShares(
      spark: SparkSession,
      events: DataFrame,
      pcts: Seq[Long] = Seq(1L, 5L, 10L, 20L)): DataFrame = {
    import spark.implicits._
    val spend = events
      .filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(Money.microsSum(col("value")).as("m"))
    val w = Window.orderBy(col("m").desc, col("user_id"))
    val ranked = spend
      .select(
        col("m"),
        row_number().over(w).cast("long").as("rk"),
        count(lit(1)).over(Window.partitionBy()).as("n"),
        sum(col("m")).over(Window.partitionBy()).as("tot"),
        sum(col("m"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("cum"))
    val cuts = pcts.toDF("pct")
    ranked
      .join(
        broadcast(cuts),
        col("rk") === greatest(lit(1L), expr("(n * pct) DIV 100")))
      .select(
        col("pct"),
        col("rk").as("k_users"),
        Money.microsToMoney(col("cum")).as("head_money"),
        floor6(col("cum").cast("double") / col("tot").cast("double")).as("share"))
  }
}
