package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ChiSquare, KsTest}

/** Hand-computed KS and χ²/Cramér's V cells plus the null cases (identical
  * distributions / perfectly proportional tables score zero).
  */
final class KsChi2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("KS: hand-computed D on {1,2,3} vs {3,4}") {
    val df = Seq((1L, 0L), (2L, 0L), (3L, 0L), (3L, 1L), (4L, 1L)).toDF("x", "arm")
    val r = KsTest.twoSample(df, "x", "arm").collect().head
    // c0 = 1,2,3,3; c1 = 0,0,1,2 → max|c0·2 − c1·3| = |4−0| = 4 at x=2
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((3L, 2L, 4L)))
    assert(r.getLong(3) === 666666L) // 4·1e6 DIV 6
  }

  test("KS: identical samples give D = 0") {
    val vals = Seq(5L, 7L, 7L, 9L, 12L)
    val df = (vals.map((_, 0L)) ++ vals.map((_, 1L))).toDF("x", "arm")
    val r = KsTest.twoSample(df, "x", "arm").collect().head
    assert(r.getLong(2) === 0L)
    assert(r.getLong(3) === 0L)
  }

  test("chi2: perfectly proportional table scores zero; diagonal scores V = 1") {
    val prop = (Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(30)(("b", "x")) ++ Seq.fill(60)(("b", "y"))).toDF("r", "c")
    val rp = ChiSquare.contingency(prop, "r", "c").collect().head
    assert(rp.getLong(3) === 0L)
    assert(rp.getLong(4) === 0L)
    val diag = (Seq.fill(30)(("a", "x")) ++ Seq.fill(30)(("b", "y"))).toDF("r", "c")
    val rd = ChiSquare.contingency(diag, "r", "c").collect().head
    // chi2 = N = 60 → 60e6 micros; V = sqrt(60/60) = 1
    assert(rd.getLong(0) === 60L)
    assert(rd.getLong(3) === 60000000L)
    assert(rd.getLong(4) === 1000000L)
  }

  test("Mann-Kendall/Theil-Sen: hand-computed monotone and noisy series") {
    import graft.operators.RobustTrend
    // strictly increasing: S = P = 6, tau = 1, all pairwise slopes = 2
    val up = Seq((1L, 10L), (2L, 12L), (3L, 14L), (4L, 16L)).toDF("x", "y")
    val ru = RobustTrend.mannKendallTheilSen(up, "x", "y").collect().head
    assert((ru.getLong(0), ru.getLong(1), ru.getLong(2)) === ((4L, 6L, 6L)))
    assert(ru.getLong(3) === 1000000L)
    assert(ru.getLong(4) === 2000000L)
    // one wild outlier: OLS would swing, Theil-Sen stays at the grid slope
    val noisy = Seq((1L, 10L), (2L, 12L), (3L, 1000L), (4L, 16L), (5L, 18L))
      .toDF("x", "y")
    val rn = RobustTrend.mannKendallTheilSen(noisy, "x", "y").collect().head
    // slopes: majority are 2.0 (grid pairs); the lower median is 2.0
    assert(rn.getLong(4) === 2000000L, rn.toString)
    // S: 9 up pairs, 1 down pair (3->4... (3,1000)->(4,16) and ->(5,18)) —
    // pairs from x=3: (3,4) down, (3,5) down → S = 8 − 2 = 6 of 10
    assert(rn.getLong(2) === 6L)
  }

  test("chi2: a single-category dimension reports V = 0, not a crash") {
    val df = (Seq.fill(5)(("a", "x")) ++ Seq.fill(5)(("b", "x"))).toDF("r", "c")
    val r = ChiSquare.contingency(df, "r", "c").collect().head
    assert(r.getLong(2) === 1L)
    assert(r.getLong(4) === 0L)
  }
}
