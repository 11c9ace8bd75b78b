package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Offline retrieval/recommendation evaluation — per-query recall@k,
  * MRR@k, and binary-relevance nDCG@k from a ranked candidate frame and a
  * relevance frame. This is the eval harness half of the recommender
  * story ([[graft.ml.Recommender]] reports Recall@K for ALS internally;
  * this operator scores ANY ranking — heuristic, popularity, ANN — against
  * any ground truth, at corpus scale).
  *
  * Shape: one equi-join of the top-k candidates against the (query, item)
  * relevance pairs, then a per-query aggregate — no windows over the full
  * corpus, no driver loops. Metrics are emitted per query; global means
  * are one further aggregate the caller owns.
  *
  * Float parity: ranks and hit counts are integers; DCG/IDCG use
  * `log2`, with IDCG folded left over [1, min(k, n_rel)] exactly as
  * DuckDB's `list_reduce` replays it, so q_ranking_metrics hash-matches
  * with the standard round-6 on every float output.
  */
object RankingEval {

  /** Per-query metrics. `ranked` must carry `rankCol` (1-based, dense per
    * query); rows with rank > k are ignored. Queries with no relevant
    * items are dropped (their metrics are undefined); queries whose
    * relevant set never intersects the top-k score 0.0 across the board.
    */
  def metrics(
      ranked: DataFrame,
      relevant: DataFrame,
      k: Int,
      queryCol: String,
      itemCol: String,
      rankCol: String = "rank"
  ): DataFrame = {
    require(k > 0, "k must be positive")
    val rel = relevant.select(col(queryCol), col(itemCol)).distinct()
    val nRel = rel.groupBy(col(queryCol)).agg(count(lit(1)).as("n_rel"))
    val scored = ranked.filter(col(rankCol) <= k)
      .join(rel.withColumn("_hit", lit(1)), Seq(queryCol, itemCol), "left")
      .groupBy(col(queryCol)).agg(
        sum(coalesce(col("_hit"), lit(0))).cast("long").as("hits"),
        min(when(col("_hit") === 1, col(rankCol))).as("_first_hit"),
        sum(when(col("_hit") === 1, lit(1.0) / log2(col(rankCol) + 1))
          .otherwise(lit(0.0))).as("_dcg"))
    // ideal DCG: left fold over [1, min(k, n_rel)] — bounded by k terms
    val idcg = aggregate(
      sequence(lit(1L), least(lit(k.toLong), col("n_rel"))),
      lit(0.0), (a, i) => a + lit(1.0) / log2(i + 1))
    nRel.join(scored, Seq(queryCol), "left")
      .select(col(queryCol), col("n_rel"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        (coalesce(col("hits"), lit(0L)).cast("double") / col("n_rel")).as("recall_at_k"),
        coalesce(lit(1.0) / col("_first_hit"), lit(0.0)).as("mrr"),
        (coalesce(col("_dcg"), lit(0.0)) / idcg).as("ndcg_at_k"))
  }
}
