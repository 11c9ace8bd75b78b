package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Mmr

/** Hand-computed MMR trajectory: a redundant near-copy of the first pick
  * must lose round 2 to a less-relevant-but-orthogonal candidate, and
  * λ = 1 must collapse to pure relevance ranking.
  */
final class MmrSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // query 0 = [1,1,0,0]; a(1) = [1,0,0,0] (rel 1e12), a2(2) = [.99,0,0,0]
  // (rel .99e12, nearly a copy of a), b(3) = [0,.9,0,0] (rel .9e12,
  // orthogonal to a). Pure relevance: a, a2, b. MMR(λ=.7): a, b, a2.
  private lazy val emb = Seq(
    (0L, Seq(1f, 1f, 0f, 0f)),
    (1L, Seq(1f, 0f, 0f, 0f)),
    (2L, Seq(0.99f, 0f, 0f, 0f)),
    (3L, Seq(0f, 0.9f, 0f, 0f))
  ).toDF("vec_id", "embedding")

  test("redundancy penalty reorders the greedy trajectory") {
    val got = Mmr.select(spark, emb, queryId = 0L, k = 3, d = 4)
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1)
    assert(got === Seq(
      (1, 1L, 1000000000000L, 7000000000000L),
      // b wins round 2: 7·.9e12 − 0 beats a2's 7·.99e12 − 3·.99e12
      (2, 3L, 900000000000L, 6300000000000L),
      // a2 last: smax vs a is .99e12 → 6.93e12 − 2.97e12
      (3, 2L, 990000000000L, 3960000000000L)))
  }

  test("negative similarities are not clamped: smax carries the raw max dot") {
    // q=[1,0,0,0]; a(1) rel 1e12 picked first; b(2) and d(3) BOTH have
    // negative rel and negative dots to every selected vector, so every
    // later round's smax is negative — a max(0, dots) clamp would shift
    // every recorded mmr_score (caught by the DuckDB oracle in r13's
    // running-smax refactor; pinned here so the spec catches it too)
    val negEmb = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)),
      (1L, Seq(1f, 0f, 0f, 0f)),
      (2L, Seq(-0.2f, 0.9f, 0f, 0f)),
      (3L, Seq(-0.1f, -0.9f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val got = Mmr.select(spark, negEmb, queryId = 0L, k = 3, d = 4)
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1)
    assert(got === Seq(
      (1, 1L, 1000000000000L, 7000000000000L),
      // d beats b in round 2: 7·(−1e11) − 3·(−1e11) = −4e11 > −8e11
      (2, 3L, -100000000000L, -400000000000L),
      // b last: smax = max(−2e11, dot(b,d) = −7.9e11) = −2e11 → −8e11
      (3, 2L, -200000000000L, -800000000000L)))
  }

  test("lambda = 1 is pure relevance ranking") {
    val got = Mmr.select(spark, emb, queryId = 0L, k = 3,
      lambdaNum = 10, lambdaDen = 10, d = 4)
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1).map(_._2)
    assert(got === Seq(1L, 2L, 3L))
  }
}
