package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Seasonal

class SeasonalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  type Row = (Long, Long, Double, Option[Double], Option[Double], Option[Double])

  private def run(vals: Seq[Double], period: Int = 4): Map[Long, Row] =
    Seasonal.decompose(
        vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("b", "v"),
        "b", "v", period)
      .as[Row].collect().map(r => r._1 -> r).toMap

  test("pure seasonal signal: trend flat at the mean, seasonal recovers the cycle") {
    // period-4 cycle repeated 8 times: 10, 20, 30, 40 → mean 25
    val vals = Seq.fill(8)(Seq(10.0, 20.0, 30.0, 40.0)).flatten
    val res = run(vals)
    val interior = res.values.filter(_._4.isDefined)
    assert(interior.nonEmpty)
    interior.foreach { r => assert(math.abs(r._4.get - 25.0) < 1e-6, s"trend of $r") }
    // seasonal at phase 0 = 10 - 25 = -15, phase 3 = +15
    val p0 = res.values.find(r => r._2 == 0 && r._6.isDefined).get
    assert(math.abs(p0._5.get + 15.0) < 1e-6)
    val p3 = res.values.find(r => r._2 == 3 && r._6.isDefined).get
    assert(math.abs(p3._5.get - 15.0) < 1e-6)
    // residuals vanish for a pure signal
    interior.filter(_._6.isDefined).foreach { r =>
      assert(math.abs(r._6.get) < 1e-6, s"resid of $r")
    }
  }

  test("trend is null on the incomplete edges, defined in the interior") {
    val res = run((1 to 12).map(_.toDouble), period = 4)
    assert(res(0L)._4.isEmpty)
    assert(res(11L)._4.isEmpty)
    assert(res(5L)._4.isDefined)
  }

  test("linear trend passes through: trend tracks the line, seasonal ~ 0") {
    // v = 2t on a period-2 cycle → detrended ≈ 0
    val res = run((0 until 20).map(_ * 2.0), period = 2)
    val r = res(10L)
    assert(r._4.isDefined)
    assert(math.abs(r._4.get - (2 * 10 - 1.0)) < 1e-6) // window [t-1, t] mean
    assert(math.abs(r._5.get) < 1.1) // phase offset of the asymmetric window
  }

  test("decomposition adds back: v = trend + seasonal + resid wherever defined") {
    val rnd = new scala.util.Random(31)
    val vals = (0 until 48).map(i => 50.0 + 10 * math.sin(i * math.Pi / 12) + rnd.nextDouble())
    val res = run(vals.map(v => math.rint(v * 1e6) / 1e6), period = 24)
    res.values.filter(_._6.isDefined).foreach { r =>
      assert(math.abs(r._3 - (r._4.get + r._5.get + r._6.get)) < 1e-5, s"row $r")
    }
  }
}
