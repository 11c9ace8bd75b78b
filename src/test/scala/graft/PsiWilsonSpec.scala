package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Binomial, Psi}

/** PSI and Wilson-interval contracts: exact zero on identical
  * distributions, the alarm on a shifted one; the textbook 10/100 Wilson
  * interval and the boundary clamps.
  */
final class PsiWilsonSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("PSI is exactly zero when a group matches the corpus, alarms on a shift") {
    // uniform: both sources spread evenly over buckets 0..4
    val same = (0 until 500).map(i => (s"s${i % 2}", i % 5)).toDF("src", "b")
    val gotSame = Psi.byGroup(same, "b", "src", 5)
      .as[(String, Long, Long)].collect()
    assert(gotSame.forall(_._3 === 0L), gotSame.mkString(", "))
    // shifted: s1 concentrates in bucket 0 while s0 stays uniform
    val shifted = ((0 until 250).map(i => ("s0", i % 5)) ++
      (0 until 250).map(_ => ("s1", 0))).toDF("src", "b")
    val gotShift = Psi.byGroup(shifted, "b", "src", 5)
      .as[(String, Long, Long)].collect().map(t => t._1 -> t._3).toMap
    // s1 vs the pooled corpus is a hard shift: PSI well above the 0.25 bar
    assert(gotShift("s1") > 250000L, gotShift.toString)
    assert(gotShift("s1") > gotShift("s0"))
  }

  test("Wilson 95% interval matches the textbook 10/100 case") {
    val df = (1 to 100).map(i => ("g", if (i <= 10) 1 else 0)).toDF("grp", "y")
    val r = Binomial.wilson(df, "y", "grp").collect().head
    assert(r.getLong(1) === 100L)
    assert(r.getLong(2) === 10L)
    assert(r.getLong(3) === 100000L)
    // Wilson(10/100, z=1.96) ≈ [0.05524, 0.17437]
    val lo = r.getLong(4); val hi = r.getLong(5)
    assert(lo > 55000L && lo < 56000L, s"lo=$lo")
    assert(hi > 174000L && hi < 175000L, s"hi=$hi")
  }

  test("Wilson clamps at the boundaries and brackets p") {
    val df = Seq(("zero", 0), ("zero", 0), ("one", 1), ("one", 1))
      .toDF("grp", "y")
    val got = Binomial.wilson(df, "y", "grp").collect()
      .map(r => r.getString(0) -> ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val (p0, lo0, hi0) = got("zero")
    assert(p0 === 0L && lo0 === 0L && hi0 > 0L && hi0 < 1000000L)
    val (p1, lo1, hi1) = got("one")
    assert(p1 === 1000000L && hi1 === 1000000L && lo1 < 1000000L && lo1 > 0L)
  }
}
