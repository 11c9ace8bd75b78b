package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RankCorrelation

/** Hand-traced Spearman/Kendall cases: perfect monotone agreement and
  * reversal, a tie-handling fixture checked against the textbook tau-b,
  * and the degenerate constant-metric guard.
  */
final class RankCorrelationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** events fabricated so day d has ~x-cents revenue and y event count. */
  private def events(rows: (String, Int, Double, Int)*) =
    rows.flatMap { case (t, d, v, n) =>
      // n events on day d; first carries the value, rest 0.0
      (1 to n).map(i => (t, d, if (i == 1) v else 0.0))
    }.toDF("event_type", "d", "value")
      .select(col("event_type"),
        to_timestamp(format_string("2024-01-%02d 12:00:00", col("d"))).as("ts"),
        col("value"))

  test("perfect monotone agreement: rho = tau = 1; reversal: -1") {
    val up = (1 to 8).map(d => ("up", d, d.toDouble, d))
    val down = (1 to 8).map(d => ("down", d, d.toDouble, 9 - d))
    val got = RankCorrelation.correlate(events((up ++ down): _*))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("up").getAs[Double]("rho") === 1.0)
    assert(got("up").getAs[Double]("tau_b") === 1.0)
    assert(got("down").getAs[Double]("rho") === -1.0)
    assert(got("down").getAs[Double]("tau_b") === -1.0)
  }

  test("tie handling: textbook tau-b on a hand-counted fixture") {
    // x: 1,2,2,3  y: 1,3,2,4 -> pairs (i<j by day):
    // (1,2)C (1,3)C (1,4)C (2,3) x-tie (2,4)C (3,4)C => c=5 d=0 tx=1 ty=0
    // n0=6: tau_b = 5/sqrt(5*6) = 0.912871
    val ev = events(
      ("t", 1, 1.0, 1), ("t", 2, 2.0, 3), ("t", 3, 2.0, 2), ("t", 4, 3.0, 4))
    val r = RankCorrelation.correlate(ev).collect().head
    assert(r.getAs[Long]("c") === 5L)
    assert(r.getAs[Long]("d") === 0L)
    assert(r.getAs[Long]("tx") === 1L)
    assert(r.getAs[Long]("ty") === 0L)
    assert(math.abs(r.getAs[Double]("tau_b") - 5.0 / math.sqrt(30.0)) < 1e-6)
    // Spearman with the x tie: doubled avg ranks rx = 2,5,5,8; ry = 2,6,4,8
    // sxy=118 sxx=118 syy=120: rho = (4*118-400)/sqrt((4*118-400)(4*120-400))
    assert(math.abs(r.getAs[Double]("rho") - 72.0 / math.sqrt(72.0 * 80.0)) < 1e-6)
  }

  test("constant metric: zero denominator guards to 0, never NaN") {
    val ev = events((1 to 6).map(d => ("t", d, 5.0, 3)): _*)
    val r = RankCorrelation.correlate(ev).collect().head
    assert(r.getAs[Double]("rho") === 0.0)
    assert(r.getAs[Double]("tau_b") === 0.0)
  }
}
