package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions
import graft.operators.Similarity
import graft.sources.Tables

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("vector math: dot, norm, cosine on known values") {
    val df = Seq((Array(3.0f, 4.0f), Array(4.0f, 3.0f))).toDF("a", "b")
    val r = df.select(
      VectorFunctions.dot($"a", $"b").as("dot"),
      VectorFunctions.norm2($"a").as("na"),
      VectorFunctions.cosine($"a", $"b").as("cos"),
      VectorFunctions.l2Distance($"a", $"b").as("l2")
    ).collect()(0)
    assert(r.getAs[Double]("dot") == 24.0)
    assert(r.getAs[Double]("na") == 5.0)
    assert(math.abs(r.getAs[Double]("cos") - 24.0 / 25.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("l2") - math.sqrt(2.0)) < 1e-12)
  }

  test("cosine of zero vector is 0, not NaN") {
    val df = Seq((Array(0.0f, 0.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    assert(df.select(VectorFunctions.cosine($"a", $"b")).as[Double].collect()(0) == 0.0)
  }

  test("bruteForceKnn returns k ranked neighbors, self excluded") {
    val emb = Tables(spark, TestSpark.Sf0001).embeddings
    val res = Similarity.bruteForceKnn(emb.filter($"vec_id" < 3), emb, k = 5).collect()
    assert(res.length == 15)
    val byQuery = res.groupBy(_.getAs[Long]("query_id"))
    byQuery.foreach { case (q, rows) =>
      assert(rows.map(_.getAs[Int]("rank")).sorted.sameElements(1 to 5))
      assert(!rows.exists(_.getAs[Long]("neighbor_id") == q))
      val cos = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cos"))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
  }

  test("lshKnn recall vs brute force ≥ 0.5 (4 planes on the 500-vector corpus)") {
    // plane count must track corpus size: 2^planes buckets. 500 vectors →
    // 4 planes (16 buckets); 8+ planes is for millions of vectors.
    val emb = Tables(spark, TestSpark.Sf0001).embeddings
    val queries = emb.filter($"vec_id" < 10)
    def keySet(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = keySet(Similarity.bruteForceKnn(queries, emb, k = 10))
    val approx = keySet(Similarity.lshKnn(queries, emb, k = 10, nPlanes = 4, nTables = 4))
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall $recall too low")
  }

  test("lshKnnDet: recall matches the float twin's bound, ranked contract holds") {
    // integer-micro quantization flips a plane sign only for points within
    // ~1e-6 of the hyperplane, so the det spelling keeps lshKnn's Gaussian
    // recall profile — assert the same >= 0.6 bound the float path carries.
    val emb = Tables(spark, TestSpark.Sf0001).embeddings
    val queries = emb.filter($"vec_id" < 10)
    def keySet(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = keySet(Similarity.bruteForceKnn(queries, emb, k = 10))
    val det = Similarity.lshKnnDet(queries, emb, k = 10, nPlanes = 4, nTables = 4)
    val rows = det.collect()
    rows.groupBy(_.getAs[Long]("query_id")).values.foreach { rs =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.sameElements(1 to rs.length))
      assert(rs.forall(r => r.getAs[Double]("cos6") >= -1.0 && r.getAs[Double]("cos6") <= 1.0))
    }
    val recall = (exact & keySet(det)).size.toDouble / exact.size
    assert(recall >= 0.6, s"det recall $recall too low")
  }

  test("ivfKnn recall vs brute force ≥ 0.6 (8 lists, 4 probes)") {
    val emb = Tables(spark, TestSpark.Sf0001).embeddings
    val queries = emb.filter($"vec_id" < 10)
    def keySet(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = keySet(Similarity.bruteForceKnn(queries, emb, k = 10))
    val approx = Similarity.ivfKnn(queries, emb, k = 10, nLists = 8, nProbe = 4)
    // contract: ≤ k ranked rows per query, ranks contiguous from 1
    val byQuery = approx.collect().groupBy(_.getAs[Long]("query_id"))
    byQuery.values.foreach { rows =>
      assert(rows.map(_.getAs[Int]("rank")).sorted.sameElements(1 to rows.length))
    }
    val recall = (exact & keySet(approx)).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall $recall too low")
  }

  test("cosineNearDupPairs finds planted duplicate vector") {
    val vecs = Seq(
      (1L, Array.tabulate(64)(i => math.sin(i.toDouble).toFloat)),
      (2L, Array.tabulate(64)(i => (math.sin(i.toDouble) * 1.001).toFloat)), // same direction
      (3L, Array.tabulate(64)(i => math.cos(i * 2.0).toFloat))
    ).toDF("vec_id", "embedding")
    val pairs = Similarity.cosineNearDupPairs(vecs, threshold = 0.99, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._2 == 3L))
  }

  test("q_cosine_neardup returns the planted pairs (-i, i) at cos 1.0") {
    val got = SparkEntry.queries("q_cosine_neardup")(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    for (i <- 1L to 3L) {
      val hit = got.find(p => p._1 == -i && p._2 == i)
      assert(hit.exists(_._3 == 1.0), s"missing planted pair (-$i, $i): ${got.toSeq}")
    }
  }

  test("cosineNearDupPairs: maxBucketSize bounds the hot-bucket join") {
    // 1,000 copies of one vector all land in a single LSH bucket — the
    // uncapped self-join is ~500k pairs; the cap drops the bucket instead.
    val v = Array.tabulate(64)(i => math.sin(i.toDouble).toFloat)
    val hot = spark.range(1000).select($"id".as("vec_id"), typedLit(v).as("embedding"))
    assert(Similarity.cosineNearDupPairs(hot, threshold = 0.5, dim = 64,
      maxBucketSize = 100).count() == 0L)
    val small = spark.range(20).select($"id".as("vec_id"), typedLit(v).as("embedding"))
    assert(Similarity.cosineNearDupPairs(small, threshold = 0.5, dim = 64,
      maxBucketSize = 100).count() == 20L * 19 / 2)
  }

  test("simhashNearDupPairs: identical vectors always collide; cos6 = 1.0") {
    // exact copies share every Rademacher sign, so recall on exact dups
    // is 1 by construction (no seeded-RNG luck involved)
    val emb = Tables(spark, TestSpark.Sf0001).embeddings
      .select($"vec_id", $"embedding")
    val planted = emb.filter($"vec_id".between(1, 3))
      .select((-$"vec_id").as("vec_id"), $"embedding")
    val got = Similarity.simhashNearDupPairs(emb.unionByName(planted))
      .as[(Long, Long, Double)].collect()
    Seq(1L, 2L, 3L).foreach { i =>
      val p = got.find(t => t._1 == -i && t._2 == i)
      assert(p.nonEmpty, s"planted pair (-$i, $i) missing")
      assert(p.get._3 === 1.0d)
    }
    // every reported pair passed the exact cos >= 1/2 verify
    assert(got.forall(_._3 >= 0.499999d))
  }

  test("cosineNearDupPairsDet: same Gaussian planes, exact replay, float-path parity") {
    val emb = Tables(spark, TestSpark.Sf0001).embeddings
      .select($"vec_id", $"embedding")
    val planted = emb.filter($"vec_id".between(1, 3))
      .select((-$"vec_id").as("vec_id"), $"embedding")
    val corpus = emb.unionByName(planted)
    val det = Similarity.cosineNearDupPairsDet(corpus)
      .as[(Long, Long, Double)].collect()
    Seq(1L, 2L, 3L).foreach { i =>
      val p = det.find(t => t._1 == -i && t._2 == i)
      assert(p.exists(_._3 == 1.0d), s"planted pair (-$i, $i) missing from det path")
    }
    assert(det.forall(_._3 >= 0.499999d))
    // the float Gaussian path over the same corpus recovers the same
    // planted pairs (identical vectors share every plane sign in both
    // spellings — the parity the det twin is allowed to claim)
    val fl = Similarity.cosineNearDupPairs(corpus, threshold = 0.5, dim = 64)
      .select($"id1", $"id2").as[(Long, Long)].collect().toSet
    Seq(1L, 2L, 3L).foreach(i => assert(fl.contains((-i, i))))
  }

  test("simhashNearDupPairs deterministic across runs") {
    val emb = Tables(spark, TestSpark.Sf0001).embeddings
      .select($"vec_id", $"embedding")
    def run() = Similarity.simhashNearDupPairs(emb)
      .as[(Long, Long, Double)].collect().sortBy(t => (t._1, t._2)).toSeq
    assert(run() === run())
  }
}
