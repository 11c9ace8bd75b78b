package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Funnel

class FunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val events = Seq(
    // u1 completes the funnel in order
    (1L, "view", 100L), (1L, "click", 200L), (1L, "purchase", 300L),
    // u2: click BEFORE the first view never counts; no click after -> stage 1
    (2L, "click", 50L), (2L, "view", 100L), (2L, "purchase", 400L),
    // u3: same-instant progression counts (>= semantics)
    (3L, "view", 100L), (3L, "click", 100L), (3L, "purchase", 100L),
    // u4: out-of-order purchase, then a later full path after re-click
    (4L, "view", 10L), (4L, "purchase", 20L), (4L, "click", 30L), (4L, "purchase", 40L),
    // u5: never views -> stage 0 even though click+purchase exist
    (5L, "click", 10L), (5L, "purchase", 20L),
    // u6: picks the FIRST view even if a later view has a faster continuation
    (6L, "view", 100L), (6L, "view", 500L), (6L, "click", 510L)
  ).toDF("user_id", "event_type", "ts_us")

  private lazy val got =
    Funnel.ordered(events, "user_id", "event_type", "ts_us", Seq("view", "click", "purchase"))
      .select($"user_id", $"t_step1", $"t_step2", $"t_step3", $"stage")
      .as[(Long, Option[Long], Option[Long], Option[Long], Int)]
      .collect().map(r => r._1 -> r).toMap

  test("ordered progression: steps only count at-or-after the previous step") {
    assert(got(1L) == ((1L, Some(100L), Some(200L), Some(300L), 3)))
    assert(got(2L) == ((2L, Some(100L), None, None, 1)))
    assert(got(4L) == ((4L, Some(10L), Some(30L), Some(40L), 3)))
    assert(got(5L) == ((5L, None, None, None, 0)))
  }

  test("same-instant events progress the funnel (>= semantics)") {
    assert(got(3L) == ((3L, Some(100L), Some(100L), Some(100L), 3)))
  }

  test("anchored at the FIRST occurrence of step 1") {
    assert(got(6L) == ((6L, Some(100L), Some(510L), None, 2)))
  }

  test("single exchange: all funnel windows share one user partitioning") {
    val plan = Funnel
      .ordered(events, "user_id", "event_type", "ts_us", Seq("view", "click", "purchase"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange:\n$plan")
    assert(!plan.toLowerCase.contains("joinexec"), "funnel must not plan a join")
  }
}
