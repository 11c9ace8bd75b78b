package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SemanticDedup

class SemanticDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 4 well-separated base directions in R^8, with planted near-copies
  private def corpus(): org.apache.spark.sql.DataFrame = {
    val base = Seq(
      Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f),
      Array(0f, 1f, 0f, 0f, 0f, 0f, 0f, 0f),
      Array(0f, 0f, 1f, 0f, 0f, 0f, 0f, 0f),
      Array(0f, 0f, 0f, 1f, 0f, 0f, 0f, 0f)
    )
    val rows = (0 until 40).map { i =>
      val b = base(i % 4)
      // ids 0..3 are the originals; every later row is a tiny perturbation
      // of its base direction → near-duplicate of the min id in its family
      val eps = 0.001f * (i / 4)
      val v = b.zipWithIndex.map { case (x, j) => x + (if (j == 7) eps else 0f) }
      (i.toLong, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("planted near-duplicates collapse to the min-id representative") {
    val survivors = SemanticDedup.dedup(corpus(), threshold = 0.999, nClusters = 4)
      .select($"vec_id").as[Long].collect().toSet
    assert(survivors == Set(0L, 1L, 2L, 3L), s"got $survivors")
  }

  test("orthogonal vectors all survive at any threshold") {
    val df = Seq(
      (1L, Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f, 0f, 0f, 0f, 0f, 0f)),
      (3L, Array(0f, 0f, 1f, 0f, 0f, 0f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val survivors = SemanticDedup.dedup(df, threshold = 0.5, nClusters = 2)
      .select($"vec_id").as[Long].collect().toSet
    assert(survivors == Set(1L, 2L, 3L))
  }

  test("pairs are ordered id1 < id2 with cosine above threshold") {
    val pairs = SemanticDedup.pairs(corpus(), threshold = 0.999, nClusters = 4)
      .select($"id1", $"id2", $"cos").as[(Long, Long, Double)].collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall { case (a, b, c) => a < b && c >= 0.999 })
  }
}
