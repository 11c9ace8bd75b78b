package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** TextRank keyword extraction (Mihalcea & Tarau 2004): build a word
  * co-occurrence graph from ADJACENT token pairs, run weighted PageRank
  * over it, read the top-ranked words off as corpus keywords.
  *
  * Graph construction is bounded by design: nodes are the global
  * top-`vocabTop` non-stopword tokens (count desc, word asc —
  * deterministic), edges are adjacent pairs where BOTH endpoints are
  * nodes, canonicalized `least < greatest`, weighted by adjacency count.
  * However large the corpus, the graph is ≤ V nodes / V² edges and the
  * only corpus-scale stages are the two token aggregates (word counts,
  * adjacency counts) — the shuffles every vocabulary profile already
  * pays. The rank loop is [[PageRank.weightedRanks]]'s BIGINT-nanos
  * recurrence: hash-replayable, constant per-round cost.
  */
object TextRank {

  /** Corpus stopword list shared with the oracle spelling (SharedCtes
    * StopSql — one list, two engines).
    */
  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")

  /** Top-`topK` keywords with their BIGINT-nanos TextRank scores.
    * Output: `word`, `rank_e9`.
    */
  def keywords(
      docs: DataFrame,
      textCol: String = "text",
      vocabTop: Int = 100,
      topK: Int = 20,
      iterations: Int = 5
  ): DataFrame = {
    val toks = docs.select(TextFunctions.tokens(col(textCol)).as("toks"))
    val nodes = toks.select(explode(col("toks")).as("word"))
      .filter(!col("word").isInCollection(Stopwords))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word")).limit(vocabTop)
      .select(col("word"))
    // adjacent pairs; both endpoints must be graph nodes
    val n = size(col("toks"))
    val adj = toks
      .filter(n >= 2)
      .select(explode(zip_with(
        slice(col("toks"), lit(1), greatest(n - 1, lit(0))),
        slice(col("toks"), lit(2), greatest(n - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .filter(col("w1") =!= col("w2"))
    val edges = adj
      .join(broadcast(nodes.withColumnRenamed("word", "w1")), Seq("w1"))
      .join(broadcast(nodes.withColumnRenamed("word", "w2")), Seq("w2"))
      .select(least(col("w1"), col("w2")).as("src"),
        greatest(col("w1"), col("w2")).as("dst"))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
    PageRank.weightedRanks(edges, "src", "dst", "w", iterations)
      .orderBy(col("rank_e9").desc, col("node"))
      .limit(topK)
      .select(col("node").as("word"), col("rank_e9"))
  }
}
