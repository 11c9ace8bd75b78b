package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Densify

class InterpolateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Option[Double])]): Map[(Long, Long), Option[Double]] =
    Densify.interpolate(rows.toDF("g", "b", "v"), "g", "b", "v")
      .select($"g", $"b", $"v_interp")
      .as[(Long, Long, Option[Double])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

  test("linear values across a gap are recovered exactly") {
    // observed at b=0 (v=10) and b=4 (v=30): interior = 15, 20, 25
    val rows = Seq(
      (1L, 0L, Some(10.0)), (1L, 1L, None), (1L, 2L, None),
      (1L, 3L, None), (1L, 4L, Some(30.0)))
    val res = run(rows)
    assert(res(1L -> 1L).contains(15.0))
    assert(res(1L -> 2L).contains(20.0))
    assert(res(1L -> 3L).contains(25.0))
    assert(res(1L -> 0L).contains(10.0))
    assert(res(1L -> 4L).contains(30.0))
  }

  test("edges without both neighbors stay null") {
    val rows = Seq(
      (1L, 0L, None), (1L, 1L, Some(5.0)), (1L, 2L, None))
    val res = run(rows)
    assert(res(1L -> 0L).isEmpty)
    assert(res(1L -> 2L).isEmpty)
    assert(res(1L -> 1L).contains(5.0))
  }

  test("groups are independent") {
    val rows = Seq(
      (1L, 0L, Some(0.0)), (1L, 2L, Some(2.0)), (1L, 1L, None),
      (2L, 0L, Some(100.0)), (2L, 2L, Some(0.0)), (2L, 1L, None))
    val res = run(rows)
    assert(res(1L -> 1L).contains(1.0))
    assert(res(2L -> 1L).contains(50.0))
  }

  test("multiple observed segments interpolate piecewise") {
    val rows = Seq(
      (1L, 0L, Some(0.0)), (1L, 1L, None), (1L, 2L, Some(10.0)),
      (1L, 3L, None), (1L, 4L, Some(0.0)))
    val res = run(rows)
    assert(res(1L -> 1L).contains(5.0))
    assert(res(1L -> 3L).contains(5.0))
  }

  test("one exchange: both direction windows share a partitioning and sort") {
    val df = (1L to 100L).map(i => (i % 5, i, if (i % 3 == 0) None else Some(i.toDouble)))
      .toDF("g", "b", "v")
    val plan = Densify.interpolate(df, "g", "b", "v")
      .queryExecution.executedPlan.toString
    val ex = "Exchange hashpartitioning".r.findAllIn(plan).length
    val sorts = "Sort ".r.findAllIn(plan).length
    assert(ex == 1, s"expected one exchange, got $ex:\n$plan")
    assert(sorts <= 2, s"expected <= 2 sorts, got $sorts")
  }
}
