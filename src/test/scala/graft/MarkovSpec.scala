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

  private def stationaryMap(rows: Seq[(Long, String, Long, Long)], states: Seq[String])
      : Map[String, (Double, Double, Double)] =
    Markov.stationary(
        Markov.transitions(rows.toDF("user_id", "event_type", "ts_us", "event_id")),
        states)
      .collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3))))
      .toMap

  test("stationary: deterministic 2-cycle splits mass evenly, zero entropy") {
    // a→b→a→b…: P is the swap matrix; π = (1/2, 1/2), every H = 0
    val rows = (1L to 8L).map(t => (1L, if (t % 2 == 1) "a" else "b", t, t))
    val res = stationaryMap(rows, Seq("a", "b"))
    assert(res("a") == ((0.5, 0.0, 0.0)))
    assert(res("b") == ((0.5, 0.0, 0.0)))
  }

  test("stationary: converges to the analytic fixed point") {
    // a→a ×3, a→b ×1, b→a ×2, b→b ×2 → P = [[.75,.25],[.5,.5]],
    // πP = π at π = (2/3, 1/3)
    // one two-event user per transition keeps the multiset explicit
    val trans = Seq(("a", "a"), ("a", "a"), ("a", "a"), ("a", "b"),
      ("b", "a"), ("b", "a"), ("b", "b"), ("b", "b"))
    val rows = trans.zipWithIndex.flatMap { case ((c, x), u) =>
      Seq((u.toLong, c, 1L, 2L * u), (u.toLong, x, 2L, 2L * u + 1)) }
    val res = stationaryMap(rows, Seq("a", "b"))
    assert(math.abs(res("a")._1 - 2.0 / 3) < 1e-5)
    assert(math.abs(res("b")._1 - 1.0 / 3) < 1e-5)
    assert(math.abs(res("a")._1 + res("b")._1 - 1.0) < 1e-5)
    // H(a) = H(3/4,1/4), H(b) = H(1/2,1/2) = ln 2
    val h2 = -(0.75 * math.log(0.75)) - 0.25 * math.log(0.25)
    assert(math.abs(res("a")._2 - h2) < 1e-6)
    assert(math.abs(res("b")._2 - math.log(2.0)) < 1e-6)
    // rate = Σ πᵢ hᵢ, identical on every row
    val rate = res("a")._1 * res("a")._2 + res("b")._1 * res("b")._2
    assert(math.abs(res("a")._3 - rate) < 1e-5)
    assert(res("a")._3 == res("b")._3)
  }

  test("stationary: off-alphabet transitions excluded; unseen state self-loops") {
    // user path a→z→b: with alphabet (a,b,z-less) the z transitions drop;
    // with z present it keeps its uniform share via the self-loop
    val rows = Seq((1L, "a", 1L, 1L), (1L, "b", 2L, 2L), (1L, "a", 3L, 3L),
      (1L, "b", 4L, 4L))
    val res = stationaryMap(rows, Seq("a", "b", "zzz"))
    assert(res("zzz")._1 == 0.333333) // conserved uniform share, floor6'd
    assert(res("zzz")._2 == 0.0)      // no observed transitions → H = 0
  }
}
