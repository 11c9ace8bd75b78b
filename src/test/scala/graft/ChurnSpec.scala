package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Churn

/** Daily churn ledger vs a hand-traced activity table. */
final class ChurnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("hand-traced new/retained/churned flags") {
    import spark.implicits._
    // u1 active d0,d1,d3 ; u2 active d1 only
    val df = Seq((1L, 0L), (1L, 1L), (1L, 3L), (2L, 1L), (1L, 0L))
      .toDF("user_id", "day")
      .select(col("user_id"), timestamp_seconds(col("day") * 86400 + 5).as("ts"))
    val got = Churn.dailyLedger(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // d0: u1 active+new, retained into d1, not churned
    assert(got(0L) === ((1L, 1L, 1L, 0L)))
    // d1: u1 (not new, gap to d3 → churned), u2 (new, churned)
    assert(got(1L) === ((2L, 1L, 0L, 2L)))
    // d3: u1 new again (gap), churned (last day)
    assert(got(3L) === ((1L, 1L, 0L, 1L)))
  }
}
