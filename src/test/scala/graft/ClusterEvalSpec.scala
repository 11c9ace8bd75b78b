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

  private def runNmi(assign: Seq[(Long, Long)], labels: Seq[(Long, Int)]) = {
    import spark.implicits._
    ClusterEval.nmi(
      assign.toDF("vec_id", "cid"), labels.toDF("vec_id", "label"))
      .collect().head
  }

  test("NMI: perfect clustering is 1, independent replica on a mixed case") {
    val r = runNmi(
      Seq(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L),
      Seq(1L -> 7, 2L -> 7, 3L -> 9, 4L -> 9))
    assert(r.getDouble(4) === 1.0) // MI = H(U) = H(V) → 2·MI/(HU+HV) = 1

    // mixed case replicated with an independent driver-side computation
    // at the SAME micro quantization
    val assign = Seq(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L)
    val labels = Seq(1L -> 1, 2L -> 1, 3L -> 1, 4L -> 2)
    val m = runNmi(assign, labels)
    val cont = assign.map(_._2).zip(labels.map(_._2)).groupBy(identity)
      .map { case (k, v) => (k, v.size.toLong) }
    val n = 4.0
    def q(x: Double) = math.floor(x * 1000000.0 + 0.5).toLong
    val aS = cont.groupBy(_._1._1).map { case (_, m2) => m2.values.sum }
    val bS = cont.toSeq.groupBy(_._1._2).map { case (_, m2) => m2.map(_._2).sum }
    val aM = cont.groupBy(_._1._1).map { case (c, m2) => (c, m2.values.sum) }
    val bM = cont.toSeq.groupBy(_._1._2).map { case (l, m2) => (l, m2.map(_._2).sum) }
    val miE6 = cont.map { case ((c, l), nij) =>
      q((nij / n) * math.log((nij * n) / (aM(c).toDouble * bM(l).toDouble)))
    }.sum
    val huE6 = aS.map(a => q(-(a / n) * math.log(a / n))).sum
    val hvE6 = bS.map(b => q(-(b / n) * math.log(b / n))).sum
    assert(m.getLong(1) === miE6)
    assert(m.getLong(2) === huE6)
    assert(m.getLong(3) === hvE6)
    val expect = math.floor(2.0 * miE6 / (huE6 + hvE6).toDouble * 1000000.0 + 0.5) / 1000000.0
    assert(m.getDouble(4) === expect)
  }

  test("NMI degenerate: single cluster and single label → 1 by convention") {
    val r = runNmi(Seq(1L -> 0L, 2L -> 0L), Seq(1L -> 5, 2L -> 5))
    assert(r.getLong(2) === 0L) // H(U) = 0
    assert(r.getLong(3) === 0L) // H(V) = 0
    assert(r.getDouble(4) === 1.0)
  }
}
