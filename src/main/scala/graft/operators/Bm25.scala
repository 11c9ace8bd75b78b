package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Okapi BM25 retrieval — the lexical ranking function behind Lucene /
  * Elasticsearch and the BM25-filtered retrieval stages of RAG pipelines:
  *
  *   score(q, d) = Σ_{t ∈ q} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
  *   idf(t)     = ln( (N − df + 0.5) / (df + 0.5) + 1 )        (Lucene form,
  *                always positive — the raw Robertson idf goes negative for
  *                df > N/2 and breaks score monotonicity)
  *
  * [[TfIdf]] scores a document's own terms; BM25 scores documents AGAINST A
  * QUERY SET with document-length normalization, which is the retrieval
  * shape (top-k per query), not the feature-extraction shape.
  *
  * Scale shape: the corpus is tokenized once; (doc, word) term frequencies
  * and per-doc lengths come out of one explode + hash aggregate. The query
  * side — queries × their terms joined with the word df table — is bounded
  * by the query workload (thousands of rows), so it is explicitly
  * `broadcast`: the posting-list join `terms ⋈ query_terms` on `word`
  * touches each corpus posting at most |matching query terms| times and
  * the corpus never reshuffles for the join. The final per-(query, doc)
  * aggregate shuffles only matched postings, and top-k ranking partitions
  * by query (bounded partitions, never a global sort).
  *
  * Numeric discipline: tf, df, dl, N are exact integers; avgdl = Σdl/N is
  * one identical IEEE division on both engines. The per-(query, doc) sum
  * over matched terms is rounded to 6 decimals BEFORE ranking (the
  * [[Anomaly]] flag discipline), so a rank boundary cannot flip on a
  * float ulp; ties break on doc_id.
  *
  * Reference anchor: the reference's TF-IDF/token analytics stop at
  * per-document scores (`src/analysis/eda_analysis.py` token frequencies);
  * BM25 extends the same token machinery to the query-ranking surface a
  * training-data curation stack needs (benchmark-leak search, targeted
  * corpus probes).
  */
object Bm25 {

  /** Top-k BM25 hits per query.
    *
    * @param queries (queryIdCol, termCol) — one row per query term.
    *                Duplicate terms in a query are collapsed (set
    *                semantics, the standard bag-of-words query model).
    * @return (query_id, rank, doc_id, score) — rank 1..topK by
    *         (score desc, doc_id); queries matching nothing emit no rows.
    */
  def topDocs(
      docs: DataFrame,
      queries: DataFrame,
      k1: Double = 1.2,
      b: Double = 0.75,
      topK: Int = 10,
      idCol: String = "doc_id",
      textCol: String = "text",
      queryIdCol: String = "query_id",
      termCol: String = "term"
  ): DataFrame = {
    val tok = docs.select(col(idCol), TextFunctions.tokens(col(textCol)).as("toks"))

    // N and avgdl in one bounded driver probe (exact integer sums).
    val Array(nDocs, totLen) = tok
      .agg(count(lit(1)), sum(size(col("toks")))).head().toSeq
      .map(v => Option(v).fold(0L)(_.asInstanceOf[Number].longValue)).toArray
    require(nDocs > 0, "Bm25.topDocs: empty corpus")
    val avgdl = totLen.toDouble / nDocs

    val terms = tok
      .select(col(idCol), size(col("toks")).as("dl"), explode(col("toks")).as("word"))
      .groupBy(col(idCol), col("dl"), col("word"))
      .agg(count(lit(1)).as("tf"))

    val docFreq = terms.groupBy(col("word")).agg(count(lit(1)).as("df"))

    // Query terms with idf attached — bounded by the query workload, so
    // df joins onto IT (broadcast both ways), never onto the corpus table.
    val queryTerms = queries
      .select(col(queryIdCol).as("query_id"), col(termCol).as("word")).distinct()
      .join(docFreq, Seq("word"))
      .withColumn("idf",
        log((lit(nDocs.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)))

    val scored = terms
      .join(broadcast(queryTerms.select(col("query_id"), col("word"), col("idf"))), Seq("word"))
      .withColumn("term_score",
        col("idf") * (col("tf") * (lit(k1) + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / lit(avgdl))))
      .groupBy(col("query_id"), col(idCol))
      .agg(round(sum(col("term_score")), 6).as("score"))

    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col(idCol))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col(idCol), col("score"))
  }
}
