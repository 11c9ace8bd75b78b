package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Decay

class DecaySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hand-traced half-life quantized weights") {
    // ref = 100, half-life 10: k = (100 - ts) div 10
    val ev = Seq(
      ("a", 100L), // k 0 -> 1_000_000
      ("a", 95L),  // k 0 -> 1_000_000
      ("a", 89L),  // k 1 ->   500_000
      ("b", 55L),  // k 4 ->    62_500
      ("b", -100L) // k 20 ->        0
    ).toDF("event_type", "ts_us")
    val m = Decay.trendingScores(ev, "event_type", halfLifeUs = 10L)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(m("a").getLong(3) == 2500000L)
    assert(m("a").getLong(1) == 3L && m("a").getLong(2) == 100L)
    assert(m("b").getLong(3) == 62500L)
  }

  test("recency dominates volume: one fresh event outranks many stale ones") {
    val ev = (Seq(("hot", 1000L)) ++ Seq.fill(30)(("cold", 800L)))
      .toDF("event_type", "ts_us")
    // cold: k = 200 div 10 = 20 -> weight 0 each; hot: 1e6
    val m = Decay.trendingScores(ev, "event_type", halfLifeUs = 10L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(m("hot") == 1000000L && m("cold") == 0L)
  }
}
