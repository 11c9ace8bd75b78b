package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Benford

class BenfordSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cents conversion, digit slicing, sub-cent and non-positive filtering") {
    val amounts = Seq(1.0, 0.005, 25.50, 0.001, 999.99, -3.0).toDF("amt")
    val m = Benford.firstDigitAudit(amounts, "amt").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 1.00 -> 100 (d1); 0.005 -> 1 (d1); 25.50 -> 2550 (d2);
    // 0.001 -> 0 cents (dropped); 999.99 -> 99999 (d9); -3.0 dropped
    assert(m(1L) == 2L && m(2L) == 1L && m(9L) == 1L)
    assert((1L to 9L).map(m).sum == 4L, "all nine digits present, zeros filled")
  }

  test("chi2 terms replay the shared-literal formula exactly") {
    assert(Benford.PE6.head == 301030L && Benford.PE6.sum >= 999999L)
    val amounts = Seq(1.0, 1.5, 25.50, 999.99).toDF("amt")
    val rows = Benford.firstDigitAudit(amounts, "amt").collect()
      .map(r => r.getLong(0) -> r).toMap
    val n = 4L
    (1 to 9).foreach { d =>
      val p = Benford.PE6(d - 1)
      val obs = rows(d.toLong).getLong(1)
      assert(rows(d.toLong).getLong(3) == n * p)
      val e = n * p / 1000000.0
      val dev = obs.toDouble - e
      assert(rows(d.toLong).getLong(4) ==
        math.floor(dev * dev / e * 1000000.0 + 0.5).toLong)
    }
  }

  test("a perfectly Benford-ish sample scores lower than a flat one") {
    // 30 organic-looking multi-scale amounts vs 30 same-leading-digit ones
    val organic = Seq(1.2, 10.4, 17.3, 2.5, 29.0, 3.1, 1.9, 12.0, 4.4, 1.05,
      6.2, 1.11, 2.9, 38.0, 1.6, 2.2, 5.9, 1.02, 94.0, 3.3,
      1.4, 2.0, 7.7, 1.8, 13.5, 4.9, 1.3, 2.6, 8.8, 1.7).toDF("amt")
    val flat = Seq.fill(30)(9.99).toDF("amt")
    def chi2(df: org.apache.spark.sql.DataFrame) =
      Benford.firstDigitAudit(df, "amt").collect().map(_.getLong(4)).sum
    assert(chi2(organic) < chi2(flat))
  }
}
