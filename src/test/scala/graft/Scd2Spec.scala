package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Scd2

class Scd2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  type Out = (Long, String, Long, Option[Long], Int, Boolean)

  private def run(rows: Seq[(Long, Long, Long, String)]): Seq[Out] =
    Scd2.buildIntervals(
        rows.toDF("k", "ts", "tie", "v"), Seq("k"), "ts", "tie", Seq("v"))
      .select($"k", $"v", $"valid_from", $"valid_to", $"version", $"is_current")
      .as[Out].collect().toSeq.sortBy(r => (r._1, r._5))

  test("the scaladoc example: collapse, reopen, current flag") {
    val rows = Seq(
      (1L, 10L, 1L, "A"), (1L, 20L, 2L, "A"), (1L, 30L, 3L, "B"), (1L, 50L, 4L, "A"))
    val res = run(rows)
    assert(res == Seq(
      (1L, "A", 10L, Some(30L), 1, false),
      (1L, "B", 30L, Some(50L), 2, false),
      (1L, "A", 50L, None, 3, true)))
  }

  test("intervals abut exactly: each valid_to equals the next valid_from") {
    val rows = (1L to 20L).map(i => (1L, i * 10, i, s"v${i % 4}"))
    val res = run(rows)
    res.sliding(2).foreach {
      case Seq(a, b) => assert(a._4.contains(b._3))
      case _         =>
    }
    assert(res.last._4.isEmpty && res.last._6)
    assert(res.count(_._6) == 1)
  }

  test("keys are independent and a single-change key is current from its ts") {
    val rows = Seq((1L, 10L, 1L, "A"), (2L, 99L, 2L, "Z"))
    val res = run(rows)
    assert(res == Seq(
      (1L, "A", 10L, None, 1, true),
      (2L, "Z", 99L, None, 1, true)))
  }

  test("same-instant changes order by the tiebreak") {
    val rows = Seq((1L, 10L, 2L, "B"), (1L, 10L, 1L, "A"))
    val res = run(rows)
    assert(res.map(_._2) == Seq("A", "B"))
    assert(res.head._4.contains(10L))
  }

  test("one exchange: lag, lead, and version share the key window") {
    val df = (1L to 100L).map(i => (i % 7, i, i, s"s${i % 3}"))
      .toDF("k", "ts", "tie", "v")
    val plan = Scd2.buildIntervals(df, Seq("k"), "ts", "tie", Seq("v"))
      .queryExecution.executedPlan.toString
    val n = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(n == 1, s"expected 1 exchange, got $n:\n$plan")
  }
}
