package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ProductQuantization
import graft.sources.Tables

class PqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val handCb: ProductQuantization.Codebooks =
    // 2 subspaces × 2 centroids × 2 dims
    Array(
      Array(Array(0.0, 0.0), Array(10.0, 10.0)),
      Array(Array(0.0, 5.0), Array(5.0, 0.0))
    )

  test("encode picks the argmin centroid per subspace") {
    val df = Seq(
      (1L, Array(9.0f, 9.0f, 0.5f, 4.5f)), // near cb0[1], cb1[0]
      (2L, Array(1.0f, -1.0f, 4.0f, 1.0f)) // near cb0[0], cb1[1]
    ).toDF("vec_id", "embedding")
    val codes = ProductQuantization.encode(df, handCb)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getSeq[Int](r.fieldIndex("codes"))).toMap
    assert(codes(1L) == Seq(1, 0))
    assert(codes(2L) == Seq(0, 1))
  }

  test("encode ties resolve to the lowest code") {
    // equidistant from both centroids of each subspace
    val df = Seq((1L, Array(5.0f, 5.0f, 2.5f, 2.5f))).toDF("vec_id", "embedding")
    val codes = ProductQuantization.encode(df, handCb).collect()(0) match { case r => r.getSeq[Int](r.fieldIndex("codes")) }
    assert(codes == Seq(0, 0))
  }

  test("ADC distance equals exact distance to the decoded vector") {
    // the defining PQ identity: adist(q, x) = ||q - decode(encode(x))||²,
    // because the query-side table is exact per subspace
    val emb = Tables(spark, TestSpark.Sf0001).embeddings
    val cb = ProductQuantization.fixedCodebooks(emb, m = 4, k = 8, dim = 64)
    val res = ProductQuantization.adcTopK(
      emb.filter($"vec_id" === 100L), emb.filter($"vec_id" < 50), cb, k = 5)
    val codes = ProductQuantization.encode(emb.filter($"vec_id" < 50), cb)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getSeq[Int](r.fieldIndex("codes")).toArray).toMap
    val qv = emb.filter($"vec_id" === 100L)
      .select($"embedding").collect()(0).getSeq[Float](0).map(_.toDouble).toArray
    res.collect().foreach { r =>
      val decoded = codes(r.getAs[Long]("neighbor_id"))
        .zipWithIndex.flatMap { case (c, s) => cb(s)(c) }
      val exact = qv.zip(decoded).map { case (a, b) => (a - b) * (a - b) }.sum
      assert(math.abs(r.getAs[Double]("adist") - exact) < 1e-9,
        s"adist ${r.getAs[Double]("adist")} vs decoded-exact $exact")
    }
  }

  test("adcTopK contract: k ranked rows per query, self excluded, adist ascending") {
    val emb = Tables(spark, TestSpark.Sf0001).embeddings
    val cb = ProductQuantization.fixedCodebooks(emb)
    val rows = ProductQuantization.adcTopK(emb.filter($"vec_id" < 3), emb, cb, k = 5).collect()
    assert(rows.length == 15)
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.sameElements(1 to 5))
      assert(!rs.exists(_.getAs[Long]("neighbor_id") == q))
      val d = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("adist"))
      assert(d.zip(d.tail).forall { case (a, b) => a <= b })
    }
  }

  test("trained PQ + exact rerank: recall vs exact L2 top-10") {
    val emb = Tables(spark, TestSpark.Sf0001).embeddings
    val queries = emb.filter($"vec_id" < 10)
    // exact squared-L2 top-10 ground truth (PQ approximates L2, not cosine)
    val q = broadcast(queries.select($"vec_id".as("query_id"), $"embedding".as("qv")))
    val scored = emb.select($"vec_id".as("neighbor_id"), $"embedding".as("nv"))
      .join(q, $"neighbor_id" =!= $"query_id")
      .select($"query_id", $"neighbor_id",
        graft.functions.VectorFunctions.l2Distance($"qv", $"nv").as("l2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"l2", $"neighbor_id")
    val exact = scored.withColumn("rank", row_number().over(w)).filter($"rank" <= 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val cb = ProductQuantization.train(emb, m = 8, k = 16, dim = 64)
    val approx = ProductQuantization.adcTopK(queries, emb, cb, k = 10, rerank = 50)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall $recall too low")
  }

  test("IVFADC: recall vs exact L2 with residual codebooks and rerank") {
    val emb = Tables(spark, TestSpark.Sf0001).embeddings
    val queries = emb.filter($"vec_id" < 10)
    val q = broadcast(queries.select($"vec_id".as("query_id"), $"embedding".as("qv")))
    val scored = emb.select($"vec_id".as("neighbor_id"), $"embedding".as("nv"))
      .join(q, $"neighbor_id" =!= $"query_id")
      .select($"query_id", $"neighbor_id",
        graft.functions.VectorFunctions.l2Distance($"qv", $"nv").as("l2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"l2", $"neighbor_id")
    val exact = scored.withColumn("rank", row_number().over(w)).filter($"rank" <= 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val approx = ProductQuantization.ivfAdcKnn(queries, emb,
        k = 10, nLists = 8, nProbe = 4, m = 8, codes = 16, rerank = 50)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // candidate pool is only nProbe/nLists of the corpus — probe recall
    // bounds total recall, same regime as SimilaritySpec's ivfKnn bound
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall too low")

    // contract: ranks contiguous from 1, self excluded
    val rows = ProductQuantization.ivfAdcKnn(queries, emb,
      k = 10, nLists = 8, nProbe = 4, m = 8, codes = 16).collect()
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (qid, rs) =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.sameElements(1 to rs.length))
      assert(!rs.exists(_.getAs[Long]("neighbor_id") == qid))
    }
  }

  test("plan: encode is a zero-shuffle projection; ADC corpus side never shuffles vectors") {
    val emb = Tables(spark, TestSpark.Sf0001).embeddings
    val cb = ProductQuantization.fixedCodebooks(emb)
    val pEnc = ProductQuantization.encode(emb, cb)
      .queryExecution.executedPlan.toString
    assert(!pEnc.contains("Exchange"), s"encode must not shuffle:\n$pEnc")
    val pAdc = ProductQuantization.adcTopK(emb.filter($"vec_id" < 3), emb, cb, k = 5)
      .queryExecution.executedPlan.toString
    assert(pAdc.contains("BroadcastNestedLoopJoin") || pAdc.contains("BroadcastExchange"),
      s"query side must broadcast:\n$pAdc")
    // the only hash shuffle is the per-query top-k window
    assert("Exchange hashpartitioning".r.findAllIn(pAdc).size == 1,
      s"expected exactly one hash exchange (top-k window):\n$pAdc")
  }
}
