package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IvfReplay, KMeansReplay}

/** IvfReplay vs the exact brute-force integer-L2 top-k: probing every list
  * must EQUAL the exact ranking (the candidate set is the whole corpus),
  * and partial probing on a clustered fixture must keep high recall while
  * returning only exactly-scored candidates.
  */
final class IvfReplaySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val d = 4
  // four tight blobs at the corners of a square (±0.5) plus a per-point
  // deterministic jitter — well-separated, so the coarse quantizer's lists
  // track blobs and probing the nearest list recovers most true neighbors
  private val blobs: Seq[(Long, Array[Float])] = {
    val corners = Seq((0.5f, 0.5f), (0.5f, -0.5f), (-0.5f, 0.5f), (-0.5f, -0.5f))
    (0L until 40L).map { i =>
      val (cx, cy) = corners((i % 4).toInt)
      i -> Array(cx + 0.002f * (i / 4), cy - 0.003f * (i / 4), 0.1f, -0.1f)
    }
  }

  private def df: DataFrame = {
    import spark.implicits._
    blobs.toDF("vec_id", "embedding")
  }

  /** Exact integer-L2 top-k over the full corpus — the same quantization
    * and ordering IvfReplay scores with, candidate set = everything.
    */
  private def exactKnn(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = KMeansReplay.quantize(queries, "embedding", d)
      .select(col("vec_id").as("query_id"), col("xq").as("qx"))
    val c = KMeansReplay.quantize(corpus, "embedding", d)
      .select(col("vec_id").as("neighbor_id"), col("xq").as("nx"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("d2"), col("neighbor_id"))
    c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        aggregate(zip_with(col("qx"), col("nx"), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, v) => acc + v).as("d2"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  private def asTuples(r: DataFrame): Set[(Long, Long, Long, Int)] =
    r.collect().map(x => (
      x.getLong(x.fieldIndex("query_id")),
      x.getLong(x.fieldIndex("neighbor_id")),
      x.getLong(x.fieldIndex("d2")),
      x.getInt(x.fieldIndex("rank")))).toSet

  test("probing all lists equals the exact brute-force ranking") {
    val queries = df.filter(col("vec_id") < 4)
    val got = asTuples(IvfReplay.knn(spark, queries, df,
      k = 5, nLists = 4, nProbe = 4, rounds = 2, d = d))
    val want = asTuples(exactKnn(queries, df, k = 5))
    assert(got === want)
  }

  test("partial probing: exact scores, high recall on clustered data") {
    val queries = df.filter(col("vec_id") < 4)
    val got = IvfReplay.knn(spark, queries, df,
      k = 5, nLists = 4, nProbe = 2, rounds = 2, d = d)
    val exact = exactKnn(queries, df, k = 5)
    // every returned (query, neighbor) pair carries the EXACT distance —
    // join against the full exact scoring and compare d2
    val exactAll = exactKnn(queries, df, k = 40)
      .select(col("query_id"), col("neighbor_id"), col("d2").as("d2_exact"))
    val joined = got.join(exactAll, Seq("query_id", "neighbor_id"), "left")
    assert(joined.filter(col("d2") =!= col("d2_exact") || col("d2_exact").isNull)
      .count() === 0L)
    // recall@5 vs exact: the blobs are well-separated, so 2-of-4 probes
    // keep at least 4 of 5 true neighbors per query on this fixture
    val hits = got.select(col("query_id"), col("neighbor_id"))
      .intersect(exact.select(col("query_id"), col("neighbor_id")))
      .count()
    assert(hits >= 16L, s"recall too low: $hits of 20")
  }

  test("deterministic across runs") {
    val queries = df.filter(col("vec_id") < 4)
    def run() = asTuples(IvfReplay.knn(spark, queries, df,
      k = 5, nLists = 4, nProbe = 2, rounds = 2, d = d))
    assert(run() === run())
  }
}
