package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Matryoshka-representation evaluation (Kusupati et al. 2022, "Matryoshka
  * Representation Learning"): how much retrieval quality survives when
  * vectors are truncated to a prefix of their dimensions. MRL-trained
  * embeddings put the information mass in the leading coordinates, so
  * serving can run ANN on a d/4-dim prefix at ~4x the throughput — IF the
  * measured recall holds up. This operator measures exactly that:
  * recall@k of prefix-dim cosine retrieval against full-dim retrieval,
  * per probe query and prefix width.
  *
  * Deterministic by construction — both rankings are exact brute-force
  * cosine top-k with id tie-breaks ([[Similarity.bruteForceKnn]]), so the
  * whole evaluation hash-matches a SQL oracle; no trained index in the
  * loop. Scale shape: the probe set is small and broadcast (the standard
  * recall-evaluation methodology — you never evaluate on the full corpus);
  * the corpus streams map-side once per prefix width, and prefix slicing
  * happens BEFORE the join so the narrow vectors are what flows through
  * the scoring. Nothing shuffles but the per-query top-k.
  */
object Matryoshka {

  /** (dim, query_id, n_hits, recall) for every probe query and prefix
    * width in `dims` — n_hits = |prefix-top-k ∩ full-top-k|, recall =
    * n_hits/k.
    */
  def prefixRecall(
      queries: DataFrame,
      corpus: DataFrame,
      dims: Seq[Int],
      k: Int = 10,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    require(dims.nonEmpty, "need at least one prefix width")
    val full = Similarity.bruteForceKnn(queries, corpus, k, idCol, vecCol)
      .select(col("query_id"), col("neighbor_id"), lit(1).as("_hit"))
    val perDim = dims.map { dim =>
      val q = queries.select(col(idCol), slice(col(vecCol), 1, dim).as(vecCol))
      val c = corpus.select(col(idCol), slice(col(vecCol), 1, dim).as(vecCol))
      Similarity.bruteForceKnn(q, c, k, idCol, vecCol)
        .select(lit(dim).as("dim"), col("query_id"), col("neighbor_id"))
    }.reduce(_ unionByName _)
    perDim
      .join(broadcast(full), Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("dim"), col("query_id"))
      .agg(sum(coalesce(col("_hit"), lit(0))).as("n_hits"))
      .withColumn("recall", round(col("n_hits").cast("double") / k, 6))
  }
}
