package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ContextPack

/** Budget-boundary semantics of the MMR-ordered context packer: an
  * exact-fit prefix is kept, and the walk STOPS at the first overflow —
  * a later shorter document is never pulled forward past it.
  */
final class ContextPackSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // MmrSpec's fixture: trajectory for query 0 at λ=0.7 is 1, 3, 2
  private lazy val emb = Seq(
    (0L, Seq(1f, 1f, 0f, 0f)),
    (1L, Seq(1f, 0f, 0f, 0f)),
    (2L, Seq(0.99f, 0f, 0f, 0f)),
    (3L, Seq(0f, 0.9f, 0f, 0f))
  ).toDF("vec_id", "embedding")

  // token counts: doc 1 → 5, doc 3 → 4, doc 2 → 2 (doc 0 is the query)
  private lazy val docs = Seq(
    (0L, "q q q"),
    (1L, "a b c d e"),
    (2L, "x y"),
    (3L, "p q r s")
  ).toDF("doc_id", "text")

  private def packed(budget: Long): Seq[(Int, Long, Long, Long)] =
    ContextPack.pack(spark, emb, docs, queryId = 0L, k = 3, budget = budget, d = 4)
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1).toSeq

  test("exact fit at the budget boundary is kept") {
    // cum: 5, 9, 11 — budget 9 keeps ranks 1 and 2 (cum == budget), drops 3
    assert(packed(9L) === Seq((1, 1L, 5L, 5L), (2, 3L, 4L, 9L)))
  }

  test("stop at first overflow: a later shorter doc is not pulled forward") {
    // budget 8: rank 2 (4 tokens) overflows at cum 9; rank 3's 2 tokens
    // WOULD fit (5+2=7) but prefix semantics stop the walk — only rank 1
    assert(packed(8L) === Seq((1, 1L, 5L, 5L)))
  }

  test("budget larger than everything packs the whole trajectory") {
    assert(packed(100L).map(_._1) === Seq(1, 2, 3))
    assert(packed(100L).last._4 === 11L)
  }
}
