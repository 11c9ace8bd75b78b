package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SetOverlap
import graft.sources.Tables

/** Coordinated bottom-k overlap: exact on sub-k sets, estimator accuracy
  * on the corpus, and the disjoint / identical edges.
  */
final class SetOverlapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sub-k sets: estimates are EXACT (the sample is the whole set)") {
    // A = 1..100, B = 51..150 -> J = 50/150, inter 50, union 150
    val rows = (1 to 100).map(i => ("A", i.toLong)) ++
      (51 to 150).map(i => ("B", i.toLong))
    val out = SetOverlap.pairOverlaps(rows.toDF("g", "u"), "g", "u")
      .as[(String, String, Long, Long, Long, Long, Long, Long)].head()
    val (_, _, kUsed, jaccE6, unionEst, interEst, exactJ, exactU) = out
    assert(kUsed === 150L && unionEst === 150L && exactU === 150L)
    assert(jaccE6 === exactJ && jaccE6 === 50L * 1000000L / 150L)
    assert(interEst === jaccE6 * 150L / 1000000L)
  }

  test("disjoint and identical pairs hit the boundary values") {
    val rows = (1 to 60).map(i => ("A", i.toLong)) ++
      (1 to 60).map(i => ("B", i.toLong)) ++ // identical to A
      (1000 to 1059).map(i => ("C", i.toLong)) // disjoint from both
    val out = SetOverlap.pairOverlaps(rows.toDF("g", "u"), "g", "u")
      .as[(String, String, Long, Long, Long, Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> t).toMap
    val ab = out(("A", "B"))
    assert(ab._4 === 1000000L && ab._7 === 1000000L) // J = 1
    val ac = out(("A", "C"))
    assert(ac._4 === 0L && ac._7 === 0L && ac._6 === 0L)
  }

  test("corpus estimates track the exact audit within sampling error") {
    val out = SetOverlap.pairOverlaps(
      Tables(spark, TestSpark.Sf0001).events, "event_type", "user_id")
      .as[(String, String, Long, Long, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (ga, gb, _, jaccE6, unionEst, _, exactJ, exactU) =>
      // k = 256: |J_est - J| binomial noise ~3%; allow 12 points absolute
      assert(math.abs(jaccE6 - exactJ) <= 120000L,
        s"($ga,$gb) jacc est $jaccE6 vs exact $exactJ")
      // bottom-k cardinality inversion: ~1/sqrt(k) relative; allow 30%
      assert(math.abs(unionEst - exactU).toDouble <= 0.30 * exactU,
        s"($ga,$gb) union est $unionEst vs exact $exactU")
    }
  }

  test("deterministic across runs") {
    def run() = SetOverlap.pairOverlaps(
      Tables(spark, TestSpark.Sf0001).events, "event_type", "user_id")
      .as[(String, String, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(t => (t._1, t._2)).toSeq
    assert(run() === run())
  }
}
