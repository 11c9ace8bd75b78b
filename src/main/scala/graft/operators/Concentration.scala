package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Money

/** Spend-concentration statistics — the Gini coefficient of per-user
  * purchase spend via the exact rank formula over the Lorenz ordering:
  *
  *   G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n,   x₁ ≤ … ≤ xₙ
  *
  * Determinism: spend is the exact integer-micros accumulator
  * ([[Money.microsSum]]); ranks come from `row_number` over
  * (spend, user_id) — permuting tied x values across ranks leaves
  * Σ i·xᵢ unchanged, so the tie-break affects nothing; Σ i·xᵢ stays an
  * exact BIGINT (i ≤ n, xᵢ micros — far under 2⁶³ at any SF); the single
  * final double expression replays identically in DuckDB, emitted under
  * the floor(x·10⁶ + 0.5) spelling (arithmetic-derived float).
  *
  * Scale: one groupBy(user) aggregation, then one global sort of the
  * per-user rollup (users ≪ events; at 1000 executors this is a modest
  * range-partitioned sort, not a fact-table sort) and an O(1) reduce.
  */
object Concentration {

  private def floor6(c: Column): Column =
    floor(c * lit(1000000.0d) + lit(0.5d)) / lit(1000000.0d)

  /** One row: (n_users, total_money, gini). */
  def spendGini(events: DataFrame): DataFrame = {
    val spend = events
      .filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(Money.microsSum(col("value")).as("m"))
    val ranked = spend.withColumn(
      "i",
      row_number().over(Window.orderBy(col("m"), col("user_id"))).cast("long"))
    ranked
      .agg(
        count(lit(1)).as("n_users"),
        sum(col("m")).as("tot"),
        sum(col("i") * col("m")).as("sw"))
      .select(
        col("n_users"),
        Money.microsToMoney(col("tot")).as("total_money"),
        floor6(
          lit(2.0d) * col("sw").cast("double")
            / (col("n_users").cast("double") * col("tot").cast("double"))
            - (col("n_users") + lit(1L)).cast("double") / col("n_users").cast("double")
        ).as("gini"))
  }
}
