package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Rbo

class RboSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ranking(q: Long, ids: Seq[Long]) =
    ids.zipWithIndex.map { case (n, i) => (q, n, i + 1) }

  private def rbo(a: Seq[(Long, Long, Int)], b: Seq[(Long, Long, Int)]): Long =
    Rbo.rboAtK(a.toDF("query_id", "neighbor_id", "rank"),
        b.toDF("query_id", "neighbor_id", "rank"))
      .collect()(0).getLong(1)

  private val ids = (1L to 10L).toSeq

  test("identical rankings score the full truncated mass; disjoint score 0") {
    val a = ranking(0L, ids)
    val expected = (1 to 10).map { d =>
      val wd = (1.0 - 0.9) * math.pow(0.9, d - 1) / d
      math.floor(d * wd * 1000000.0 + 0.5).toLong
    }.sum
    assert(rbo(a, a) == expected)
    assert(rbo(a, ranking(0L, (11L to 20L).toSeq)) == 0L)
  }

  test("head-weighted: a rank-1 disagreement costs more than a rank-10 one") {
    val a = ranking(0L, ids)
    val swapHead = ranking(0L, 99L +: ids.tail) // replaces item at rank 1
    val swapTail = ranking(0L, ids.init :+ 99L) // replaces item at rank 10
    assert(rbo(a, swapTail) > rbo(a, swapHead))
  }

  test("order within the common prefix matters: reversal scores below identity") {
    val a = ranking(0L, ids)
    val rev = ranking(0L, ids.reverse)
    assert(rbo(a, rev) < rbo(a, a) && rbo(a, rev) > 0L)
  }
}
