package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Wavelet

/** Haar energy cascade vs hand-computed coefficients. */
final class WaveletSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def series(counts: Seq[Int]) = {
    import spark.implicits._
    counts.zipWithIndex
      .flatMap { case (n, h) => (1 to n).map(k => (h.toLong * 3600 + k, 1)) }
      .toDF("s", "one")
      .select(timestamp_seconds(col("s")).as("ts"))
  }

  test("hand-computed two-level cascade") {
    // counts (4,2,1,1): L1 details (4-2, 1-1) = (2,0) → e1 = 4, 2 coeffs
    //                   L1 approx (6,2): L2 detail 6-2=4 → e2 = 16, 1 coeff
    val got = Wavelet.hourlyEnergy(series(Seq(4, 2, 1, 1)), levels = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(1L -> ((2L, 4L)), 2L -> ((1L, 16L))))
  }

  test("odd tail drops; alternating series loads level 1 only") {
    // counts (3,1,3,1,5): tail 5 has no pair partner at L1 → dropped
    // L1 details (2,2) → e1 = 8; L1 approx (4,4) → L2 detail 0 → e2 = 0
    val got = Wavelet.hourlyEnergy(series(Seq(3, 1, 3, 1, 5)), levels = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(1L -> ((2L, 8L)), 2L -> ((1L, 0L))))
  }
}
