package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bm25

class Bm25Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def q(pairs: (String, String)*) = pairs.toDF("query_id", "term")

  private def run(
      docs: Seq[(Long, String)],
      queries: Seq[(String, String)],
      k1: Double = 1.2,
      b: Double = 0.75,
      topK: Int = 10): Map[(String, Long), (Int, Double)] =
    Bm25.topDocs(docs.toDF("doc_id", "text"), q(queries: _*), k1 = k1, b = b, topK = topK)
      .as[(String, Int, Long, Double)].collect()
      .map(r => (r._1, r._3) -> (r._2, r._4)).toMap

  // Closed-form replica of one term's contribution.
  private def contrib(tf: Long, df: Long, dl: Long, n: Long, avgdl: Double,
      k1: Double = 1.2, b: Double = 0.75): Double = {
    val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
  }

  test("matches the hand-computed Okapi formula on a tiny corpus") {
    val docs = Seq(
      1L -> "spark join join slow",    // dl 4, tf(join)=2
      2L -> "spark sort merge",        // dl 3
      3L -> "window sort sort window") // dl 4
    val avgdl = 11.0 / 3
    val res = run(docs, Seq("q1" -> "join", "q1" -> "slow"))
    // Only doc 1 contains either term: df(join)=1, df(slow)=1.
    val exp = contrib(2, 1, 4, 3, avgdl) + contrib(1, 1, 4, 3, avgdl)
    assert(res.keySet == Set("q1" -> 1L))
    assert(math.abs(res("q1" -> 1L)._2 - exp) < 1e-6)
    assert(res("q1" -> 1L)._1 == 1)
  }

  test("length normalization: same tf, shorter doc ranks first") {
    val docs = Seq(
      1L -> "key key filler filler filler filler filler filler",
      2L -> "key key filler")
    val res = run(docs, Seq("q" -> "key"))
    assert(res("q" -> 2L)._1 == 1 && res("q" -> 1L)._1 == 2)
    assert(res("q" -> 2L)._2 > res("q" -> 1L)._2)
  }

  test("rarer term outranks common term at equal tf and dl") {
    val docs = Seq(
      1L -> "rare pad pad",
      2L -> "common pad pad",
      3L -> "common x y",
      4L -> "common u v")
    val res = run(docs, Seq("qr" -> "rare", "qc" -> "common"))
    assert(res("qr" -> 1L)._2 > res("qc" -> 2L)._2)
  }

  test("out-of-vocab terms contribute nothing; all-OOV query emits no rows") {
    val docs = Seq(1L -> "alpha beta", 2L -> "beta gamma")
    val withOov = run(docs, Seq("q" -> "alpha", "q" -> "zzz_nope"))
    val without = run(docs, Seq("q" -> "alpha"))
    assert(withOov == without)
    assert(run(docs, Seq("q" -> "zzz_nope")).isEmpty)
  }

  test("duplicate query terms collapse to set semantics") {
    val docs = Seq(1L -> "alpha beta", 2L -> "beta gamma")
    assert(run(docs, Seq("q" -> "alpha", "q" -> "alpha")) == run(docs, Seq("q" -> "alpha")))
  }

  test("topK cutoff with deterministic doc_id tie-break") {
    val docs = (1L to 5L).map(i => i -> "same words here")
    val res = run(docs, Seq("q" -> "same"), topK = 3)
    // All docs tie exactly; ranks must go to the 3 smallest ids.
    assert(res.keySet == Set("q" -> 1L, "q" -> 2L, "q" -> 3L))
    assert(res("q" -> 1L)._1 == 1 && res("q" -> 3L)._1 == 3)
  }

  test("posting join broadcasts the query side, never the corpus") {
    val docs = (1L to 200L).map(i => i -> s"word$i common filler").toDF("doc_id", "text")
    val plan = Bm25.topDocs(docs, q("q" -> "common"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }
}
