package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic A/B lift analysis — users hash into two arms via the
  * shared engine-portable 48-bit md5 hash ([[HashSplit.md548]] % 2, the
  * assignment a real experimentation system would persist), conversion is
  * "at least `convThreshold` purchases" (the synthetic corpus has few
  * heavy users, so ever-purchased saturates at 100% — a real degenerate
  * case: the pooled variance is 0 and z undefined; the threshold keeps
  * the proportion interior and a CASE guard still returns z = 0 on
  * degenerate data instead of dividing by zero), and the report is the
  * two-proportion pooled z-test:
  *
  *   z = (p_b − p_a) / sqrt(p̂(1−p̂)(1/n_a + 1/n_b))
  *
  * Determinism: arms, user counts and converter counts are exact integers;
  * lift and z are single double expressions over those integers, replayed
  * term-for-term by the oracle (sqrt is correctly-rounded IEEE), emitted
  * under the floor(x·10⁶+0.5) spelling.
  *
  * Scale: one groupBy(user) rollup (map-side combinable) and an O(1)
  * global reduce — no sort, no window.
  */
object AbTest {

  private def floor6(c: Column): Column =
    floor(c * lit(1000000.0d) + lit(0.5d)) / lit(1000000.0d)

  /** One row: (n_a, n_b, conv_a, conv_b, lift, z). */
  def conversionLift(events: DataFrame, convThreshold: Long = 10L): DataFrame = {
    val users = events
      .groupBy("user_id")
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("pc"))
      .select(
        col("user_id"),
        when(col("pc") >= convThreshold, 1L).otherwise(0L).as("conv"))
      .withColumn("arm", HashSplit.md548(col("user_id")) % lit(2L))
    val ag = users.agg(
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"),
      sum(when(col("arm") === 0, col("conv")).otherwise(0L)).as("conv_a"),
      sum(when(col("arm") === 1, col("conv")).otherwise(0L)).as("conv_b"))
    val pa = col("conv_a").cast("double") / col("n_a").cast("double")
    val pb = col("conv_b").cast("double") / col("n_b").cast("double")
    val pool = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    val degenerate = col("n_a") === 0 || col("n_b") === 0 ||
      col("conv_a") + col("conv_b") === 0 ||
      col("conv_a") + col("conv_b") === col("n_a") + col("n_b")
    val z = when(degenerate, lit(0.0d)).otherwise(
      (pb - pa) /
        sqrt(pool * (lit(1.0d) - pool) *
          (lit(1.0d) / col("n_a").cast("double") + lit(1.0d) / col("n_b").cast("double"))))
    val lift = when(col("n_a") === 0 || col("n_b") === 0, lit(0.0d))
      .otherwise(pb - pa)
    ag.select(
      col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
      floor6(lift).as("lift"), floor6(z).as("z"))
  }
}
