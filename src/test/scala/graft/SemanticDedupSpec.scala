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

  test("deterministic pipeline: KMeansReplay clusters drop the planted positive twins") {
    import org.apache.spark.sql.functions._
    // the q_semantic_dedup_det construction on the sf0.001 corpus: planted
    // copies under negative ids; keep-first must drop the POSITIVE ids
    // (−i < i) while every −i survives
    val base = graft.sources.Tables(spark, TestSpark.Sf0001).embeddings
      .select($"vec_id", $"embedding", $"label")
    val corpus2 = base.filter($"vec_id" < 2000)
      .unionByName(base.filter($"vec_id".between(1, 3))
        .select((-$"vec_id").as("vec_id"), $"embedding", $"label"))
    val assigned = graft.operators.KMeansReplay
      .assignments(spark, corpus2, "embedding", 64, 8, 3)
      .select($"vec_id", $"cid".as("cluster_id"))
      .join(corpus2, Seq("vec_id"))
    val dropped = SemanticDedup.pairsWithin(assigned, threshold = 0.9)
      .select($"id2").as[Long].collect().toSet
    assert(Set(1L, 2L, 3L).subsetOf(dropped), s"planted twins not dropped: $dropped")
    assert(!dropped.exists(_ < 0L), "keep-first must retain the smaller (negative) ids")
  }
}
