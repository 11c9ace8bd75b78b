package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RateLimit

class RateLimitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(ts: Seq[Long], cap: Long, rate: Long) =
    RateLimit.admit(
      ts.zipWithIndex.map { case (t, i) => (1L, i.toLong, t) }
        .toDF("user_id", "event_id", "ts_us"),
      capacityTokens = cap, rateMicroPerSec = rate)
      .collect().sortBy(_.event_id)
      .map(d => (d.admitted, d.tokens_after_micro))

  test("hand-traced bucket: burst drains, deny preserves, refill restores") {
    // cap 2 tokens, 0.5 token/s; events at 0,1,2,3,10 seconds
    val got = run(Seq(0L, 1000000L, 2000000L, 3000000L, 10000000L), 2L, 500000L)
    assert(got.toSeq == Seq(
      (true, 1000000L),  // full bucket: 2 -> 1
      (true, 500000L),   // +0.5 refill: 1.5 -> 0.5
      (true, 0L),        // +0.5: 1.0 -> 0
      (false, 500000L),  // +0.5: 0.5 < 1 -> DENY, tokens preserved
      (true, 1000000L))) // 7s later: refilled to cap, 2 -> 1
  }

  test("same-timestamp burst: zero refill between ties; event_id orders them") {
    val got = run(Seq(0L, 0L, 0L), 2L, 500000L)
    assert(got.toSeq == Seq((true, 1000000L), (true, 0L), (false, 0L)))
  }

  test("arbitrarily long idle gap refills exactly to capacity (overflow-capped dt)") {
    val got = run(Seq(0L, Long.MaxValue / 2), 3L, 1000000L)
    assert(got.toSeq == Seq((true, 2000000L), (true, 2000000L)))
  }

  test("zero refill rate: only the initial capacity is ever spent") {
    val got = run(Seq(0L, 1000000L, 2000000L), 1L, 0L)
    assert(got.toSeq == Seq((true, 0L), (false, 0L), (false, 0L)))
  }

  test("keys are independent: each user gets its own bucket") {
    val df = Seq((1L, 1L, 0L), (2L, 2L, 0L), (1L, 3L, 1L), (2L, 4L, 1L))
      .toDF("user_id", "event_id", "ts_us")
    val got = RateLimit.admit(df, 1L, 0L).collect()
      .map(d => (d.user_id, d.event_id, d.admitted)).toSet
    assert(got == Set((1L, 1L, true), (2L, 2L, true), (1L, 3L, false), (2L, 4L, false)))
  }
}
