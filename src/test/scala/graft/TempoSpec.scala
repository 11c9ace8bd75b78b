package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Tempo

/** Hour-of-week matrix and repurchase gaps vs hand-placed events. */
final class TempoSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("hour-of-week cells and shares") {
    import spark.implicits._
    // day 0 (Thursday → dow 3) hour 5: two events; day 2 (Saturday → dow
    // 5) hour 0: one event.
    val df = Seq(5 * 3600L, 5 * 3600L + 60, 2 * 86400L)
      .toDF("s").select(timestamp_seconds(col("s")).as("ts"))
    val got = Tempo.hourOfWeekProfile(df).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got((3L, 5L)) === ((2L, math.floor(2.0 / 3.0 * 1e6 + 0.5) / 1e6)))
    assert(got((5L, 0L)) === ((1L, math.floor(1.0 / 3.0 * 1e6 + 0.5) / 1e6)))
  }

  test("repurchase gaps bucket to floor hours; single purchases drop") {
    import spark.implicits._
    // u1 purchases at 0h, 1.5h, 5h → gaps 1.5h (bucket 1), 3.5h (bucket 3)
    // u2 one purchase → nothing
    val rows = Seq(
      (1L, 1L, 0L), (2L, 1L, 5400L), (3L, 1L, 18000L),
      (4L, 2L, 100L))
    val df = rows.toDF("event_id", "user_id", "s")
      .select(col("event_id"), col("user_id"), lit("purchase").as("event_type"),
        (col("s") * lit(1000000000L)).as("ts_ns"))
    val got = Tempo.repurchaseGaps(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 3L -> 1L))
  }
}
