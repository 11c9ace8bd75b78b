package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Attribution

/** Linear multi-touch attribution vs hand-computed credit splits. */
final class AttributionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** (user, type, value, t_seconds) with ts_ns synthesized like Tables. */
  private def events(rows: Seq[(Long, String, Double, Long)]) = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((u, e, v, s), i) => (i.toLong, u, e, v, s) }
      .toDF("event_id", "user_id", "event_type", "value", "s")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        timestamp_seconds(col("s")).as("ts"),
        (col("s") * lit(1000000000L)).as("ts_ns"))
  }

  test("views in the window split the purchase value equally") {
    val h = 3600L
    val df = events(Seq(
      (1L, "view", 0.0, 50 * h),          // in window (24h before 60h)
      (1L, "view", 0.0, 59 * h),          // in window
      (1L, "view", 0.0, 20 * h),          // OUTSIDE window
      (1L, "purchase", 10.0, 60 * h),
      (2L, "view", 0.0, 59 * h),          // other user: no purchase
      (3L, "purchase", 7.0, 60 * h)))     // purchase with no views → dropped
    val got = Attribution.linearByHour(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // credits: 10.0 / 2 = 5.0 to the views at hours 50 (02:00) and 59 (11:00)
    assert(got === Map(2L -> ((1L, 5.0)), 11L -> ((1L, 5.0))))
  }

  test("integer division drops the remainder identically") {
    val h = 3600L
    val df = events(Seq(
      (1L, "view", 0.0, 59 * h),
      (1L, "view", 0.0, 59 * h + 60),
      (1L, "view", 0.0, 59 * h + 120),
      (1L, "purchase", 10.0, 60 * h)))
    val got = Attribution.linearByHour(df).collect()
    // 10_000_000 micros DIV 3 = 3_333_333 each; all three views at hour 11
    assert(got.length === 1)
    assert(got.head.getLong(1) === 3L)
    // 3 * 3_333_333 = 9_999_999 micros → cents half-up → 100.00? No:
    // (9_999_999 + 5000) / 10000 floor = 1000 cents = 10.0
    assert(got.head.getDouble(2) === 10.0)
  }
}
