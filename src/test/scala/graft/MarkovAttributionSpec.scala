package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MarkovAttribution

class MarkovAttributionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(rows: (Long, String, Long, Long)*) =
    rows.toDF("user_id", "event_type", "ts_us", "event_id")

  test("journeys truncate at the first purchase and close non-converters with null") {
    val t = MarkovAttribution.journeyTransitions(ev(
      (1L, "view", 10L, 1L), (1L, "purchase", 20L, 2L), (1L, "click", 30L, 3L),
      (2L, "view", 10L, 4L)
    )).collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // user 1: start->view->conv (the post-purchase click is DROPPED);
    // user 2: start->view->null
    assert(t == Map(
      ("start", "view") -> 2L, ("view", "conv") -> 1L, ("view", "null") -> 1L))
  }

  test("hand-traced removal effects on a two-path funnel") {
    // 2 users convert through view, 1 through click, 1 views and drops
    val events = ev(
      (1L, "view", 1L, 1L), (1L, "purchase", 2L, 2L),
      (2L, "view", 1L, 3L), (2L, "purchase", 2L, 4L),
      (3L, "click", 1L, 5L), (3L, "purchase", 2L, 6L),
      (4L, "view", 1L, 7L)
    )
    val m = MarkovAttribution.attribution(spark, events).collect()
      .map(r => r.getString(0) -> r).toMap
    // chain: start->view 3/4, start->click 1/4; view->conv 2/3,
    // view->null 1/3; click->conv 1/1. Full absorbed mass:
    // 3/4·2/3 + 1/4 = 3/4 of 1e9 (integer division exact here)
    val pFull = m("view").getLong(1)
    assert(pFull == 750000000L, s"got $pFull")
    // removing view leaves only the click path: 1/4
    assert(m("view").getLong(2) == 250000000L)
    assert(m("view").getLong(3) == 500000000L)
    // removing click leaves the view path: 1/2
    assert(m("click").getLong(2) == 500000000L)
    assert(m("click").getLong(3) == 250000000L)
    // signup never appears: zero removal effect
    assert(m("signup").getLong(3) == 0L)
    // shares: 500/750 and 250/750
    assert(m("view").getLong(4) == math.floor(500000000.0 * 1e6 / 750000000.0).toLong)
    assert(m("click").getLong(4) == math.floor(250000000.0 * 1e6 / 750000000.0).toLong)
    assert(m("signup").getLong(4) == 0L)
  }

  test("no conversions anywhere -> zero effects, NULL shares") {
    val m = MarkovAttribution.attribution(spark,
      ev((1L, "view", 1L, 1L), (2L, "click", 1L, 2L))).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(m.values.forall(r => r.getLong(1) == 0L && r.getLong(3) == 0L))
    assert(m.values.forall(_.isNullAt(4)))
  }
}
