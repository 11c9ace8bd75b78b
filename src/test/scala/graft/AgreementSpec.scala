package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Agreement

/** Fleiss' kappa: hand-traced rater categories, the hand-computed κ on a
  * mixed fixture, the degenerate perfect-marginal guard, and the
  * tokenless-doc convention.
  */
final class AgreementSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs(rows: (Long, String, String, Long)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "lang", "text", "n_chars")
  }

  test("rater categories follow the integer thresholds") {
    val d = docs(
      // r1=0 (<150); r2: 1/4 -> 0; r3: 8/4 = 2 -> 0
      (0L, "en", "aa aa aa aa", 100L),
      // r1=2 (>=300); r2: 4/4 -> 2; r3: 24/4 = 6 -> 2
      (1L, "en", "abcdef ghijkl mnopqr stuvwx", 400L),
      // r1=1; r2: 2/4 = 0.5 -> 1; r3: 16/4 = 4 -> 1
      (2L, "en", "abcd efgh abcd efgh", 200L))
    val got = Agreement.fleissRatings(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Int]("r1"), r.getAs[Int]("r2"), r.getAs[Int]("r3")))
      .toMap
    assert(got(0L) === ((0, 0, 0)))
    assert(got(1L) === ((2, 2, 2)))
    assert(got(2L) === ((1, 1, 1)))
  }

  test("hand-computed kappa on a mixed fixture") {
    val d = docs(
      (0L, "en", "aa aa aa aa", 100L),                  // (0,0,0)
      (1L, "en", "abcdef ghijkl mnopqr stuvwx", 400L),  // (2,2,2)
      (2L, "en", "abcd efgh abcd efgh", 200L),          // (1,1,1)
      // r1=0 (<150) but diverse long words -> r2=2, r3=2: S = 1+4 = 5
      (3L, "en", "abcdef ghijkl mnopqr stuvwx", 100L))
    // N=4, ssum=32, c=(4,3,5): Pbar=20/24, Pe=50/144
    val expected = {
      val pbar = 20.0 / 24.0; val pe = 50.0 / 144.0
      (pbar - pe) / (1.0 - pe)
    }
    val k = Agreement.fleissKappa(d).collect().head.getAs[Double]("kappa")
    assert(math.abs(k - expected) < 1e-6, s"kappa $k expected $expected")
  }

  test("unanimous single-category corpus hits the Pe=1 guard -> 0") {
    val d = docs((0L, "en", "aa aa aa aa", 100L), (1L, "en", "bb bb bb bb", 90L))
    assert(Agreement.fleissKappa(d).collect().head.getAs[Double]("kappa") === 0.0)
  }

  test("hand-computed Krippendorff alpha on the mixed fixture") {
    val d = docs(
      (0L, "en", "aa aa aa aa", 100L),                  // (0,0,0)
      (1L, "en", "abcdef ghijkl mnopqr stuvwx", 400L),  // (2,2,2)
      (2L, "en", "abcd efgh abcd efgh", 200L),          // (1,1,1)
      (3L, "en", "abcdef ghijkl mnopqr stuvwx", 100L))  // (0,2,2)
    // N=4, ssum=32, c=(4,3,5), M=12: Do=4/24, De=94/132 -> alpha=72/94
    val r = Agreement.krippendorffAlpha(d).collect().head
    assert(r.getAs[Long]("do_num") === 4L)
    assert(r.getAs[Long]("de_num") === 94L)
    assert(math.abs(r.getAs[Double]("alpha") - 72.0 / 94.0) < 1e-6)
  }

  test("tokenless doc rates 0 from every rater") {
    val got = Agreement.fleissRatings(docs((0L, "en", "   ", 10L)))
      .collect().head
    assert((got.getAs[Int]("r1"), got.getAs[Int]("r2"), got.getAs[Int]("r3")) === ((0, 0, 0)))
    assert(got.getAs[Long]("nj0") === 3L)
  }
}
