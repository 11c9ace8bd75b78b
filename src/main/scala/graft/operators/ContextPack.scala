package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RAG context packing under a token budget: the policy that turns a
  * retrieval result into a prompt. Candidates are ordered by [[Mmr]]
  * (relevance-vs-redundancy greedy against the query), then the packed
  * context is the LONGEST PREFIX of that order whose cumulative token
  * count fits `budget` — prompt-window semantics: the walk stops at the
  * first overflow (cumulative counts are monotone, so `cum ≤ budget` IS
  * the stop rule; a later shorter document is not pulled forward past a
  * longer one the MMR order ranked higher).
  *
  * Fully replayable: the MMR trajectory is the oracled integer-micros
  * greedy ([[Mmr.select]]), token counts are exact integer `size(tokens)`,
  * and the running offset is a BIGINT prefix sum over the ≤ k selected
  * rows (a bounded driver-sized frame — the only window in the plan runs
  * over k rows, never the corpus). Composes [[Mmr]]'s selection order with
  * [[Packing]]'s offset discipline.
  *
  * Scale shape: candidate selection cost is Mmr's k·N·d; everything after
  * is a broadcast-sized join of k rows against the token projection of the
  * document table (zero-shuffle scan side, k-row window).
  */
object ContextPack {

  /** `(sel_rank, doc_id, n_tokens, cum_tokens)` — the packed prefix of the
    * MMR trajectory for query `queryId`, in selection order.
    */
  def pack(
      spark: SparkSession,
      emb: DataFrame,
      docs: DataFrame,
      queryId: Long,
      k: Int = 8,
      budget: Long = 120L,
      lambdaNum: Int = 7,
      lambdaDen: Int = 10,
      vecCol: String = "embedding",
      d: Int = 64): DataFrame = {
    val traj = Mmr.select(spark, emb, queryId, k, lambdaNum, lambdaDen, vecCol, d)
    val toks = docs.select(col("doc_id"),
      size(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("n_tokens"))
    // the trajectory is a k-row driver-local relation: the unpartitioned
    // window below sorts k rows, not the corpus
    val w = Window.orderBy(col("sel_rank"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    traj.select(col("sel_rank"), col("vec_id").as("doc_id"))
      .join(toks, Seq("doc_id"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budget)
      .select(col("sel_rank"), col("doc_id"), col("n_tokens"), col("cum_tokens"))
  }
}
