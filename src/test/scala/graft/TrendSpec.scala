package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Trend

class TrendSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  type Row = (Long, Long, Option[Double], Option[Double], Option[Double])

  private def run(df: org.apache.spark.sql.DataFrame): Map[Long, Row] =
    Trend.olsPerGroup(df, Seq("k"), "x", "y", xScale = 1.0)
      .select($"k", $"n", $"slope", $"intercept", $"r2")
      .as[Row].collect().map(r => r._1 -> r).toMap

  test("exact linear data recovers slope, intercept, r2 = 1") {
    val df = (0 until 50).map(i => (1L, i.toLong, 3.0 * i + 2.0)).toDF("k", "x", "y")
    val (_, n, slope, intercept, r2) = run(df)(1L)
    assert(n == 50)
    assert(math.abs(slope.get - 3.0) < 1e-6)
    assert(math.abs(intercept.get - 2.0) < 1e-6)
    assert(math.abs(r2.get - 1.0) < 1e-6)
  }

  test("matches the closed-form OLS on noisy data") {
    val rnd = new scala.util.Random(17)
    val pts = (0 until 200).map(i => (i.toDouble, 5.0 - 0.25 * i + rnd.nextGaussian()))
    val df = pts.map { case (x, y) => (1L, x.toLong, y) }.toDF("k", "x", "y")
    val n = pts.length.toDouble
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum; val sxx = pts.map(p => p._1 * p._1).sum
    val expSlope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val expIcpt = (sy - expSlope * sx) / n
    val (_, _, slope, intercept, _) = run(df)(1L)
    assert(math.abs(slope.get - expSlope) < 1e-5)
    assert(math.abs(intercept.get - expIcpt) < 1e-5)
  }

  test("degenerate groups emit null, never divide by zero") {
    val df = Seq(
      (1L, 10L, 1.0), (1L, 10L, 5.0), // constant x -> no slope
      (2L, 1L, 4.0), (2L, 2L, 4.0), (2L, 3L, 4.0), // constant y -> slope 0, r2 null
      (3L, 7L, 9.0) // single point
    ).toDF("k", "x", "y")
    val got = run(df)
    assert(got(1L)._3.isEmpty && got(1L)._5.isEmpty)
    assert(got(2L)._3.exists(s => math.abs(s) < 1e-9) && got(2L)._5.isEmpty)
    assert(got(3L)._3.isEmpty)
  }

  test("one exchange: rebase window and stats aggregate share the key partitioning") {
    val df = (0 until 100).map(i => ((i % 5).toLong, i.toLong, i * 1.0)).toDF("k", "x", "y")
    val plan = Trend.olsPerGroup(df, Seq("k"), "x", "y")
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }
}
