package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-type association lift — for every unordered pair of event types,
  * how much more often users do BOTH than independence predicts:
  *
  *   lift(a,b) = n_ab · N / (n_a · n_b)
  *
  * over distinct-user incidence (n_x = users who ever did x, N = all
  * users). The market-basket lift statistic on the type vocabulary.
  *
  * Determinism: all four counts are exact integers from distinct
  * (user, type) pairs; lift is one replayed double expression, floor-6.
  *
  * Scale: the distinct projection is one shuffle on (user, type); the
  * self-join runs per user on ≤|types| rows (bounded fan-out ≤ |types|²);
  * the rollup key space is |types|² — tiny.
  */
object Association {

  private def floor6(c: Column): Column =
    floor(c * lit(1000000.0d) + lit(0.5d)) / lit(1000000.0d)

  /** (type_a, type_b, n_a, n_b, n_both, lift) for type_a < type_b. */
  def typeLift(events: DataFrame): DataFrame = {
    val ut = events.select(col("user_id"), col("event_type")).distinct()
    val totals = ut.groupBy("event_type").agg(count(lit(1)).as("n_t"))
    val nUsers = ut.select(col("user_id")).distinct()
      .agg(count(lit(1)).as("n_users"))
    val pairs = ut.as("x")
      .join(ut.as("y"), col("x.user_id") === col("y.user_id"))
      .where(col("x.event_type") < col("y.event_type"))
      .groupBy(
        col("x.event_type").as("type_a"),
        col("y.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(broadcast(totals.select(col("event_type").as("type_a"), col("n_t").as("n_a"))), "type_a")
      .join(broadcast(totals.select(col("event_type").as("type_b"), col("n_t").as("n_b"))), "type_b")
      .crossJoin(broadcast(nUsers))
      .select(
        col("type_a"), col("type_b"), col("n_a"), col("n_b"), col("n_both"),
        floor6(
          col("n_both").cast("double") * col("n_users").cast("double")
            / (col("n_a").cast("double") * col("n_b").cast("double"))).as("lift"))
  }
}
