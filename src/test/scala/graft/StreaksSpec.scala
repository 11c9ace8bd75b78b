package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Streaks

/** Gaps-and-islands max-streak histogram vs hand-traced runs. */
final class StreaksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("hand-traced longest runs") {
    import spark.implicits._
    // u1: days 0,1,2,5,6 → runs 3,2 → max 3
    // u2: days 4        → max 1
    // u3: days 7,8      → max 2 (duplicate events same day collapse)
    val df = Seq(
      (1L, 0L), (1L, 1L), (1L, 2L), (1L, 5L), (1L, 6L),
      (2L, 4L),
      (3L, 7L), (3L, 8L), (3L, 8L))
      .toDF("user_id", "day")
      .select(col("user_id"), timestamp_seconds(col("day") * 86400 + 9).as("ts"))
    val got = Streaks.maxStreakHistogram(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(3L -> 1L, 1L -> 1L, 2L -> 1L))
  }
}
