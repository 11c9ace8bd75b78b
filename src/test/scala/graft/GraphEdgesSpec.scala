package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GraphEdges

/** The r20 one-pass undirected-edge spelling must be BAG-equal to the
  * union spelling it replaced in every graph operator (Components,
  * PageRank, PPR, LPA, KCore, HyperBall) — multiplicities included, since
  * PageRank's degree counts ride on duplicates.
  */
class GraphEdgesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bothDirections == union-of-swap as a bag (duplicates preserved)") {
    // includes a parallel edge (1,2)x2, a self-loop (3,3), and a reversed
    // duplicate pair (4,5)+(5,4)
    val e = Seq((1L, 2L), (1L, 2L), (3L, 3L), (4L, 5L), (5L, 4L), (7L, 9L))
      .toDF("src", "dst")
    val got = GraphEdges.bothDirections(e, "src", "dst")
      .groupBy("a", "b").count().as[(Long, Long, Long)].collect().toSet
    val want = {
      val fwd = Seq((1L, 2L), (1L, 2L), (3L, 3L), (4L, 5L), (5L, 4L), (7L, 9L))
      (fwd ++ fwd.map(_.swap)).groupBy(identity).map { case ((a, b), xs) =>
        (a, b, xs.size.toLong)
      }.toSet
    }
    assert(got == want)
  }

  test("carry columns ride unchanged on both copies (weighted PageRank shape)") {
    val e = Seq((1L, 2L, 10L), (2L, 3L, 7L)).toDF("src", "dst", "w")
    val got = GraphEdges.bothDirections(e, "src", "dst", carry = Seq("w"))
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(got == Seq((1L, 2L, 10L), (2L, 1L, 10L), (2L, 3L, 7L), (3L, 2L, 7L)))
  }

  test("one-pass: the plan references the input subtree once (no Union)") {
    val e = Seq((1L, 2L)).toDF("src", "dst")
    val p = GraphEdges.bothDirections(e, "src", "dst")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Union"), s"must not duplicate the edge subplan:\n$p")
    assert(p.contains("Generate explode"), s"explode spelling expected:\n$p")
  }
}
