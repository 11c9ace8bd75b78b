package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Autocorrelation

/** Hourly ACF vs an independent plain-Scala replica of the estimator. */
final class AutocorrelationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def series(counts: Seq[Int]) = {
    import spark.implicits._
    counts.zipWithIndex
      .flatMap { case (n, h) => (1 to n).map(k => (h.toLong * 3600 + k, 1)) }
      .toDF("s", "one")
      .select(timestamp_seconds(col("s")).as("ts"))
  }

  /** Independent replica: textbook r_ℓ from the dense integer series. */
  private def naiveAcf(xs: Seq[Long], l: Int): Double = {
    val t = xs.size
    val m = xs.sum.toDouble / t
    val num = (l until t).map(i => (xs(i) - m) * (xs(i - l) - m)).sum
    val den = xs.map(x => (x - m) * (x - m)).sum
    math.floor(num / den * 1e6 + 0.5) / 1e6
  }

  test("alternating series has strongly negative lag-1, positive lag-2 ACF") {
    val xs = Seq(4, 0, 4, 0, 4, 0, 4, 0)
    val got = Autocorrelation.hourlyAcf(series(xs), 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // zero-count hours come from the dense fill: only hours 0,2,4,6 have
    // events, 1,3,5,7 fill as 0 — except trailing zeros, which fall
    // outside [min,max] only if the last hour is empty. Use the replica on
    // the series the operator actually sees: hours 0..6 (max observed = 6).
    val seen = xs.take(7).map(_.toLong)
    assert(got(1L) === naiveAcf(seen, 1))
    assert(got(2L) === naiveAcf(seen, 2))
    assert(got(1L) < -0.8 && got(2L) > 0.6)
  }

  test("gap hours are zero-filled") {
    // events only in hours 0 and 3 → dense series (2,0,0,2)
    val got = Autocorrelation.hourlyAcf(series(Seq(2, 0, 0, 2)), 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val exp = Seq(2L, 0L, 0L, 2L)
    (1 to 3).foreach(l => assert(got(l.toLong) === naiveAcf(exp, l)))
  }
}
