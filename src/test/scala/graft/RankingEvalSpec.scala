package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RankingEval

class RankingEvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def log2(x: Double): Double = math.log(x) / math.log(2.0)

  test("closed-form metrics: hits, misses, absent queries, irrelevant queries") {
    // q1: ranked 1..5, relevant {2, 4, 99} -> 2 hits at ranks 2 and 4
    // q2: ranked 1..5, relevant {7}        -> no hit
    // q3: relevant {1}, never ranked       -> all zeros
    // q4: ranked but no relevant           -> dropped
    val ranked = (1 to 5).flatMap(r => Seq((1L, r.toLong * 10, r), (2L, r.toLong, r))) ++
      Seq((4L, 1L, 1))
    val rankedDf = ranked.toDF("q", "item", "rank")
    val rel = Seq((1L, 20L), (1L, 40L), (1L, 99L), (2L, 7L), (3L, 1L)).toDF("q", "item")
    val got = RankingEval.metrics(rankedDf, rel, k = 5, "q", "item")
      .as[(Long, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap

    assert(got.keySet == Set(1L, 2L, 3L))
    val (_, n1, h1, rec1, mrr1, ndcg1) = got(1L)
    assert(n1 == 3 && h1 == 2)
    assert(math.abs(rec1 - 2.0 / 3.0) < 1e-9)
    assert(math.abs(mrr1 - 0.5) < 1e-9)
    val dcg = 1.0 / log2(3) + 1.0 / log2(5)
    val idcg = 1.0 / log2(2) + 1.0 / log2(3) + 1.0 / log2(4)
    assert(math.abs(ndcg1 - dcg / idcg) < 1e-9)

    val (_, n2, h2, rec2, mrr2, ndcg2) = got(2L)
    assert(n2 == 1 && h2 == 0 && rec2 == 0.0 && mrr2 == 0.0 && ndcg2 == 0.0)

    val (_, n3, h3, rec3, mrr3, ndcg3) = got(3L)
    assert(n3 == 1 && h3 == 0 && rec3 == 0.0 && mrr3 == 0.0 && ndcg3 == 0.0)
  }

  test("perfect ranking scores 1.0 everywhere; ranks beyond k are ignored") {
    val ranked = (1 to 8).map(r => (1L, r.toLong, r)).toDF("q", "item", "rank")
    val rel = (1 to 3).map(i => (1L, i.toLong)).toDF("q", "item")
    val (_, nRel, hits, rec, mrr, ndcg) =
      RankingEval.metrics(ranked, rel, k = 3, "q", "item")
        .as[(Long, Long, Long, Double, Double, Double)].collect().head
    assert(nRel == 3 && hits == 3)
    assert(math.abs(rec - 1.0) < 1e-9 && math.abs(mrr - 1.0) < 1e-9 &&
      math.abs(ndcg - 1.0) < 1e-9)
    // item 4 relevant but only reachable at rank 4 > k: excluded from hits
    val rel2 = (1 to 4).map(i => (1L, i.toLong)).toDF("q", "item")
    val (_, n2, h2, rec2, _, _) =
      RankingEval.metrics(ranked, rel2, k = 3, "q", "item")
        .as[(Long, Long, Long, Double, Double, Double)].collect().head
    assert(n2 == 4 && h2 == 3 && math.abs(rec2 - 0.75) < 1e-9)
  }
}
