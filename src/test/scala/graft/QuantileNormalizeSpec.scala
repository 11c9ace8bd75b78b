package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.QuantileNormalize

/** Closed-form pins for QuantileNormalize.toPooled: hand-computed bracket
  * interpolations on a two-source example, the tie/min/max invariants, and
  * the single-doc-source → pooled-median convention.
  */
class QuantileNormalizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def norm(rows: Seq[(Long, String, Long)]): Map[Long, Double] =
    QuantileNormalize.toPooled(
      rows.toDF("doc_id", "source", "n_chars"))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap

  test("hand-computed bracket: two disjoint sources onto the pooled grid") {
    // A = [1,2,3,4], B = [10,20,30,40]; pooled sorted = [1,2,3,4,10,20,30,40]
    // (N=8). v=2 in A: cum_below=1, ties=1 -> r̄=1, n_s=4;
    // p = 1*7/3 = 2.3333 -> S[2]=3, S[3]=4, rem/D = 14%6/6 = 2/6
    // -> 3 + (2/6)*1 = 3.3333...
    val rows = Seq[(Long, String, Long)](
      (1L, "A", 1L), (2L, "A", 2L), (3L, "A", 3L), (4L, "A", 4L),
      (5L, "B", 10L), (6L, "B", 20L), (7L, "B", 30L), (8L, "B", 40L))
    val n = norm(rows)
    assert(n(1L) === 1.0)                      // source min -> pooled min
    assert(n(4L) === 40.0)                     // source max -> pooled max
    assert(n(2L) === 3.0 + (2.0 / 6.0) * 1.0)  // the bracket above
    // B mirrors A's quantiles exactly (same within-source ranks)
    assert(n(5L) === n(1L) && n(8L) === n(4L) && n(6L) === n(2L))
  }

  test("ties within a source share one normalized value (average rank)") {
    // A = [5,5,9]: the two 5s take r̄ = (0+1)/2 = 0.5 -> identical output
    val rows = Seq[(Long, String, Long)](
      (1L, "A", 5L), (2L, "A", 5L), (3L, "A", 9L),
      (4L, "B", 1L), (5L, "B", 2L), (6L, "B", 3L))
    val n = norm(rows)
    assert(n(1L) === n(2L))
    // r̄=0.5, n_s=3, N=6: p = 0.5*5/2 = 1.25; pooled sorted
    // [1,2,3,5,5,9] -> S[1]=2, S[2]=3; rem/D: A=2*0+2-1=1? R2=2*0+2-1=1,
    // a=1*5=5, dd=2*2=4 -> lo=1, rem=1 -> 2 + (1/4)*1 = 2.25
    assert(n(1L) === 2.25)
  }

  test("single-doc source maps to the pooled median") {
    val rows = Seq[(Long, String, Long)](
      (1L, "solo", 1000L),
      (2L, "B", 1L), (3L, "B", 2L), (4L, "B", 3L), (5L, "B", 4L))
    val n = norm(rows)
    // N=5, pooled sorted [1,2,3,4,1000]; p=(N-1)/2=2 exactly -> S[2]=3
    assert(n(1L) === 3.0)
  }

  test("within-source ordering is preserved and output stays in pooled range") {
    val rows = (1L to 40L).map(i =>
      (i, s"s${i % 4}", (i * 37 % 11) * 10L))
    val n = norm(rows)
    val byDoc = rows.map { case (id, s, v) => (id, s, v, n(id)) }
    byDoc.groupBy(_._2).foreach { case (_, docs) =>
      docs.sortBy(d => (d._3, d._1)).sliding(2).foreach {
        case Seq(a, b) => assert(a._4 <= b._4, s"order broken in ${a._2}")
        case _ =>
      }
    }
    val poolMin = rows.map(_._3).min.toDouble
    val poolMax = rows.map(_._3).max.toDouble
    assert(n.values.forall(v => v >= poolMin && v <= poolMax))
  }
}
