package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Hybrid lexical+dense retrieval with Reciprocal Rank Fusion (Cormack,
  * Clarke & Buettcher 2009) — the standard "BM25 ∪ vector search" fusion
  * every modern retrieval stack (RAG data curation, benchmark-leak search,
  * query-by-example corpus probes) runs:
  *
  *   rrf(d) = Σ_lists 1 / (c + rank_list(d)),  c = 60 (the paper's value)
  *
  * Query model is QUERY-BY-EXAMPLE: a probe document queries the corpus
  * twice — its distinct tokens as a bag-of-words BM25 query (the
  * "more-like-this" shape) and its embedding as a cosine kNN query — and
  * the two top-`candK` lists fuse by rank only. A document missing from
  * one list contributes 0 from that list (rank reported as 0).
  *
  * Numeric discipline: BM25 per-term scores are quantized to integer
  * micros BEFORE the per-(query, doc) sum — a query here carries ~dozens
  * of terms, far past the float-sum association hazard the 2-3-term
  * [[Bm25]] workload tolerates — so lexical ranking orders exact BIGINTs.
  * Dense ranks reuse [[Similarity.bruteForceKnn]] (hash-oracled kernel).
  * The fused score is the sum of exactly two IEEE terms in fixed order,
  * floor-6-rounded before the final ranking; all ties break on doc_id.
  *
  * Scale shape: the corpus tokenizes once into (doc, word) postings; the
  * query-term table is bounded by the probe workload and broadcast, so
  * the posting join never reshuffles the corpus. Candidate lists are
  * |queries| × candK rows — the fusion join is trivially small whatever
  * the corpus size. The dense side is brute-force here (the oracle-able
  * baseline); at billion-vector scale swap in the IVF/PQ variants — the
  * fusion contract is rank-only and does not change.
  */
object HybridRetrieval {

  private def floor6(c: Column): Column =
    floor(c * lit(1000000.0d) + lit(0.5d)) / lit(1000000.0d)

  /** Top-`topK` fused hits per probe document:
    * (query_id, rank, doc_id, rrf_score, lex_rank, dense_rank) —
    * absent-from-list ranks are 0.
    *
    * @param queryMax probe documents are ids < queryMax (the deterministic
    *                 workload convention shared with the kNN queries).
    */
  def fuseByExample(
      docs: DataFrame,
      embeddings: DataFrame,
      queryMax: Long = 5L,
      c: Int = 60,
      candK: Int = 20,
      topK: Int = 10,
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame = {
    val tok = docs.select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))

    // N and avgdl: one bounded driver probe (the Bm25 discipline)
    val Array(nDocs, totLen) = tok
      .agg(count(lit(1)), sum(size(col("toks")))).head().toSeq
      .map(v => Option(v).fold(0L)(_.asInstanceOf[Number].longValue)).toArray
    require(nDocs > 0, "HybridRetrieval.fuseByExample: empty corpus")
    val avgdl = totLen.toDouble / nDocs

    val terms = tok
      .select(col("doc_id"), size(col("toks")).as("dl"), explode(col("toks")).as("word"))
      .groupBy(col("doc_id"), col("dl"), col("word"))
      .agg(count(lit(1)).as("tf"))
    val docFreq = terms.groupBy(col("word")).agg(count(lit(1)).as("df"))

    // probe bag-of-words: distinct tokens of each query doc, idf attached —
    // bounded by the probe workload, broadcast into the posting join
    val queryTerms = tok.filter(col("doc_id") < queryMax)
      .select(col("doc_id").as("query_id"), explode(array_distinct(col("toks"))).as("word"))
      .join(docFreq, Seq("word"))
      .withColumn("idf",
        log((lit(nDocs.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)))

    val lexScores = terms
      .join(broadcast(queryTerms.select(col("query_id"), col("word"), col("idf"))), Seq("word"))
      .filter(col("doc_id") =!= col("query_id"))
      .withColumn("ts_micros",
        floor(col("idf") * (col("tf") * (lit(k1) + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / lit(avgdl))) *
          lit(1000000.0d) + lit(0.5d)).cast("long"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("ts_micros")).as("lex_micros"))
    val lw = Window.partitionBy(col("query_id"))
      .orderBy(col("lex_micros").desc, col("doc_id"))
    val lex = lexScores
      .withColumn("lex_rank", row_number().over(lw))
      .filter(col("lex_rank") <= candK)
      .select(col("query_id"), col("doc_id"), col("lex_rank"))

    val dense = Similarity
      .bruteForceKnn(embeddings.filter(col("vec_id") < queryMax), embeddings, k = candK)
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        col("rank").as("dense_rank"))

    val contrib = (rank: Column) =>
      when(rank.isNull, lit(0.0d)).otherwise(lit(1.0d) / (lit(c.toDouble) + rank))
    val fw = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_score").desc, col("doc_id"))
    lex.join(dense, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf_score",
        floor6(contrib(col("lex_rank")) + contrib(col("dense_rank"))))
      .withColumn("rank", row_number().over(fw))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("doc_id"), col("rrf_score"),
        coalesce(col("lex_rank"), lit(0)).as("lex_rank"),
        coalesce(col("dense_rank"), lit(0)).as("dense_rank"))
  }
}
