package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SkewProfile

/** Constructed skew: exact hottest-key counts, micros ratios, and the salt
  * ceiling arithmetic.
  */
final class SkewProfileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // k: 6 rows of "hot", 1 each of "a","b" (8 rows, 3 keys, max 6);
  // u: all distinct (8 keys, max 1)
  private lazy val df =
    (Seq.fill(6)("hot") ++ Seq("a", "b")).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("k", "u")

  test("exact skew stats per key column") {
    val got = SkewProfile.profile(df, Seq("k", "u"), targetRowsPerTask = 2L)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // k: avg = 8/3 → 2666666 micros; mean floor = 2 → skew 6e6/2 = 3e6;
    // salt = ceil(6/2) = 3
    assert(got("k") === (("k", 8L, 3L, 6L, 2666666L, 3000000L, 3L)))
    // u: uniform — skew exactly 1.0e6, salt 1
    assert(got("u") === (("u", 8L, 8L, 1L, 1000000L, 1000000L, 1L)))
  }

  test("salt ceiling is exact at boundaries") {
    val one = SkewProfile.profile(df, Seq("k"), targetRowsPerTask = 6L)
      .as[(String, Long, Long, Long, Long, Long, Long)].head()
    assert(one._7 === 1L) // max 6 / target 6 → exactly one task
    val two = SkewProfile.profile(df, Seq("k"), targetRowsPerTask = 5L)
      .as[(String, Long, Long, Long, Long, Long, Long)].head()
    assert(two._7 === 2L)
  }
}
