package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Privacy

/** Privacy battery on constructed micro-data: exact ladder arithmetic,
  * diversity histograms, and the DP release's calibration properties.
  */
final class PrivacySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // QI (a, b): class (x,1) has 6 rows, (x,2) has 2, (y,1) has 1;
  // sensitive s varies within (x,1) only.
  private lazy val df = (
    Seq.fill(3)(("x", 1L, "s1")) ++ Seq.fill(3)(("x", 1L, "s2")) ++
      Seq.fill(2)(("x", 2L, "s1")) ++ Seq(("y", 1L, "s1"))
  ).toDF("a", "b", "s")

  test("k-anonymity ladder: per-level min-k and suppression are exact") {
    val got = Privacy.kAnonymityLadder(df, Seq("a", "b"), kThreshold = 3L)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // gid 0 = (a,b): classes 6/2/1 -> min 1, suppressed 2 groups (3 rows)
    assert(got(0L) === ((0L, 3L, 1L, 2L, 3L, 9L, 333333L)))
    // gid 1 = (a): classes x=8, y=1 -> suppressed y (1 row)
    assert(got(1L) === ((1L, 2L, 1L, 1L, 1L, 9L, 111111L)))
    // gid 3 = (): one class of 9, nothing suppressed
    assert(got(3L) === ((3L, 1L, 9L, 0L, 0L, 9L, 0L)))
  }

  test("l-diversity histogram: distinct sensitive values per class") {
    val got = Privacy.lDiversityHistogram(df, Seq("a", "b"), col("s"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // l=1: classes (x,2) and (y,1) -> 2 groups, 3 rows; l=2: (x,1) -> 6 rows
    assert(got(1L) === ((1L, 2L, 3L)))
    assert(got(2L) === ((2L, 1L, 6L)))
  }

  test("dp histogram: released counts are within Laplace tail bounds and deterministic") {
    val keys = (Seq.fill(100)("k0") ++ Seq.fill(10)("k1")).toDF("k")
    val rel = Privacy.dpHistogram(keys, "k", eps = 1.0, salt = "t")
      .as[(String, Long)].collect().toMap
    val rel2 = Privacy.dpHistogram(keys, "k", eps = 1.0, salt = "t")
      .as[(String, Long)].collect().toMap
    assert(rel === rel2) // same salt -> same release
    // |noise| = (1/eps) * |ln(1-|c|)|; u is a mid-bucket md5-48 uniform so
    // |c| <= 1 - 2^-49 and |noise| <= 49 ln 2 < 34. Released values stay
    // within that hard envelope of the true counts (clamped at 0).
    assert(math.abs(rel("k0") - 100000000L) <= 34000000L)
    assert(rel("k1") >= 0L && rel("k1") <= (10L + 34L) * 1000000L)
    // a different salt moves the draw (with overwhelming probability)
    val rel3 = Privacy.dpHistogram(keys, "k", eps = 1.0, salt = "u")
      .as[(String, Long)].collect().toMap
    assert(rel3 !== rel)
  }

  test("dp histogram: larger epsilon means less noise for the same draw") {
    val keys = Seq.fill(50)("k").toDF("k")
    def err(eps: Double): Long = {
      val v = Privacy.dpHistogram(keys, "k", eps, salt = "t")
        .as[(String, Long)].collect().head._2
      math.abs(v - 50000000L)
    }
    // noise scales exactly as 1/eps for a fixed (salt, key) uniform
    assert(err(10.0) <= err(1.0))
    assert(err(1.0) <= err(0.1))
  }

  test("dp mean: accounting, clamped release, determinism, calibration") {
    val vals = (1L to 200L).map(v => Tuple1(v % 100)).toDF("v")
    def run(salt: String = "t", es: Double = 0.5, ec: Double = 0.5) =
      Privacy.dpMean(vals, "v", lo = 0L, hi = 100L, epsSum = es, epsCount = ec, salt = salt)
        .collect().head
    val r = run()
    assert(r.getAs[Long]("n") === 200L)
    assert(r.getAs[Long]("eps_sum_e6") === 500000L)
    assert(r.getAs[Long]("eps_count_e6") === 500000L)
    assert(r.getAs[Long]("eps_total_e6") === 1000000L)
    val rel = r.getAs[Long]("released_mean_e6")
    // post-processing clamp: release always lands in [lo, hi]
    assert(rel >= 0L && rel <= 100000000L)
    assert(run().toSeq === r.toSeq) // same salt -> same release
    // near-infinite budget -> release collapses onto the true mean (49.5)
    val exact = run(es = 1e9, ec = 1e9).getAs[Long]("released_mean_e6")
    assert(math.abs(exact - 49500000L) <= 10L, s"got $exact")
  }

  test("dp mean: one added row moves the release by at most the clamp bound") {
    // identical salt -> identical noise draws, so the release difference is
    // pure data sensitivity: the shifted sum moves by <= R and the count by
    // 1, which bounds the mean shift well inside R for n >> 1
    val base = (1L to 100L).map(v => Tuple1(50L)).toDF("v")
    val plus = ((1L to 100L).map(v => Tuple1(50L)) :+ Tuple1(100000L)).toDF("v")
    def rel(df: org.apache.spark.sql.DataFrame) =
      Privacy.dpMean(df, "v", 0L, 100L, 0.5, 0.5, "t").collect().head
        .getAs[Long]("released_mean_e6")
    // the outlier clamps to hi=100: its influence is bounded by design
    assert(math.abs(rel(plus) - rel(base)) <= 2L * 1000000L)
  }
}
