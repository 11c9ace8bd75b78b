package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ClusterEval

/** Closed-form ARI/purity cases incl. the degenerate single-partition
  * convention.
  */
final class ClusterEvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(assign: Seq[(Long, Long)], labels: Seq[(Long, Int)]) = {
    import spark.implicits._
    ClusterEval.ariPurity(
      assign.toDF("vec_id", "cid"), labels.toDF("vec_id", "label"))
      .collect().head
  }

  test("perfect clustering: ARI 1, purity 1") {
    val r = run(
      Seq(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L),
      Seq(1L -> 7, 2L -> 7, 3L -> 9, 4L -> 9))
    assert(r.getDouble(5) === 1.0)
    assert(r.getDouble(6) === 1.0)
  }

  test("hand-computed mixed case: ARI 0, purity 0.75") {
    // cont: (c0,a)=2 (c1,a)=1 (c1,b)=1; Index=1, A=2, B=3, C(4,2)=6,
    // E=1, denom=1.5 → ARI 0; purity hits 2+1=3
    val r = run(
      Seq(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L),
      Seq(1L -> 1, 2L -> 1, 3L -> 1, 4L -> 2))
    assert(r.getLong(0) === 4L)          // n
    assert(r.getLong(1) === 1L)          // pair_index
    assert(r.getLong(2) === 2L)          // a_pairs
    assert(r.getLong(3) === 3L)          // b_pairs
    assert(r.getLong(4) === 3L)          // purity_hits
    assert(r.getDouble(5) === 0.0)
    assert(r.getDouble(6) === 0.75)
  }

  test("degenerate single cluster + single label: ARI 1 by convention") {
    val r = run(Seq(1L -> 0L, 2L -> 0L), Seq(1L -> 5, 2L -> 5))
    assert(r.getDouble(5) === 1.0)
  }
}
