package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Markov

class MarkovSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, String, Long, Long)])
      : Map[(String, String), (Long, Long, Double)] =
    Markov.transitions(rows.toDF("user_id", "event_type", "ts_us", "event_id"))
      .as[(String, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap

  test("hand-computed transition counts and probabilities") {
    // user 1: a b a b ; user 2: a b  → a→b ×3, b→a ×1
    val rows = Seq(
      (1L, "a", 10L, 1L), (1L, "b", 20L, 2L), (1L, "a", 30L, 3L), (1L, "b", 40L, 4L),
      (2L, "a", 10L, 5L), (2L, "b", 20L, 6L))
    val res = run(rows)
    assert(res("a" -> "b") == ((3L, 3L, 1.0)))
    assert(res("b" -> "a") == ((1L, 1L, 1.0)))
    assert(res.size == 2)
  }

  test("probabilities within a source state sum to 1") {
    val rows = Seq(
      (1L, "a", 1L, 1L), (1L, "b", 2L, 2L), (1L, "a", 3L, 3L), (1L, "c", 4L, 4L),
      (1L, "a", 5L, 5L), (1L, "b", 6L, 6L))
    val res = run(rows)
    assert(res("a" -> "b") == ((2L, 3L, 0.666667)))
    assert(res("a" -> "c") == ((1L, 3L, 0.333333)))
    val fromA = res.collect { case ((c, _), (n, _, _)) if c == "a" => n }.sum
    assert(fromA == 3)
  }

  test("sequences never cross users; single-event users emit nothing") {
    val rows = Seq(
      (1L, "a", 10L, 1L),
      (2L, "b", 5L, 2L), (2L, "c", 6L, 3L))
    val res = run(rows)
    assert(res.keySet == Set("b" -> "c"))
  }

  test("same-instant events order by the tiebreak column") {
    val rows = Seq((1L, "x", 10L, 2L), (1L, "y", 10L, 1L))
    assert(run(rows).keySet == Set("y" -> "x"))
  }

  test("one exchange: the window partitioning feeds the pair aggregate") {
    val df = (1L to 200L).map(i => (i % 10, s"e${i % 3}", i, i))
      .toDF("user_id", "event_type", "ts_us", "event_id")
    val plan = Markov.transitions(df).queryExecution.executedPlan.toString
    val n = "Exchange hashpartitioning".r.findAllIn(plan).length
    // pairs feeds both the join and the totals branch, so its window+agg
    // subtree plans twice (identical exchanges — ReuseExchange dedups at
    // runtime); the bound pins "no extra shuffles beyond those branches"
    assert(!plan.contains("CartesianProduct"))
    assert(n <= 6, s"got $n exchanges:\n$plan")
  }
}
