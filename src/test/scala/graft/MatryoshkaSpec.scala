package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Matryoshka

/** Constructed corpus where the 2-dim prefix ranking provably diverges from
  * the full 4-dim ranking — recall@2 must be exactly 1/2 — plus the
  * trivial-width identity and grid-completeness checks.
  */
final class MatryoshkaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // q=[1,1,0,0]; a is an exact dup; b hides a huge off-prefix component
  // (prefix cosine 1, full cosine ~0.27); c is a near-dup with a tiny
  // off-prefix wiggle (full cosine ~0.9975). Full top-2 = {a, c};
  // 2-dim prefix sees three perfect cosines and tie-breaks by id → {a, b}.
  private lazy val emb = Seq(
    (0L, Seq(1f, 1f, 0f, 0f)),
    (1L, Seq(1f, 1f, 0f, 0f)),
    (2L, Seq(1f, 1f, 5f, 0f)),
    (3L, Seq(1f, 1f, 0f, 0.1f))
  ).toDF("vec_id", "embedding")

  test("prefix ranking diverges exactly as the geometry dictates") {
    val got = Matryoshka.prefixRecall(
      emb.filter(col("vec_id") === 0L), emb, dims = Seq(2, 4), k = 2)
      .select($"dim", $"query_id", $"n_hits", $"recall")
      .as[(Int, Long, Long, Double)].collect().toSet
    assert(got === Set(
      (2, 0L, 1L, 0.5), // prefix picks the off-prefix impostor b over c
      (4, 0L, 2L, 1.0)  // full-width prefix is the identity ranking
    ))
  }

  test("every (dim, query) cell is present even at zero overlap") {
    // prefix [0, 1]: query d=[0,0,1,0] has zero prefix-2 cosine to all —
    // ranking degenerates to id order, but the row still appears
    val withD = Seq((9L, Seq(0f, 0f, 1f, 0f))).toDF("vec_id", "embedding")
      .unionByName(emb)
    val got = Matryoshka.prefixRecall(
      withD.filter(col("vec_id") === 9L), withD, dims = Seq(2), k = 2)
      .select($"dim", $"query_id", $"n_hits")
      .as[(Int, Long, Long)].collect().toSet
    assert(got.size === 1)
    assert(got.head._1 === 2 && got.head._2 === 9L)
  }
}
