package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** TF-IDF over a document corpus, fully relational:
  *
  *   explode(tokens) → per-(doc, word) term counts → per-word document
  *   frequency → tfidf = tf · ln(N / df).
  *
  * Scale shape: two hash aggregates on (doc, word) and (word); the document
  * frequency table joins back onto the term table on `word`. The join is
  * deliberately NOT hint-broadcast: at 100 TB the vocabulary (typos, URLs,
  * hex ids) is unbounded and a forced broadcast OOMs the driver — AQE
  * converts it to a broadcast join at runtime when df actually fits, and
  * falls back to a shuffle join (both sides already hash-partitioned on
  * `word` from the df aggregate) when it does not. The corpus count N is
  * one column-pruned count job.
  */
object TfIdf {

  /** (doc_id, word, tf, df, tfidf) for every distinct (doc, word). */
  def termScores(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val nDocs = docs.count().toDouble
    val terms = docs
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("word"))
      .groupBy(col(idCol), col("word"))
      .agg(count(lit(1)).as("tf"))
    val docFreq = terms
      .groupBy(col("word"))
      .agg(count(lit(1)).as("df"))
    terms
      .join(docFreq, Seq("word"))
      .withColumn("tfidf", col("tf") * log(lit(nDocs) / col("df")))
  }

  /** Top-k highest-tfidf terms per document (ties → alphabetical). */
  def topTerms(
      docs: DataFrame,
      k: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("tfidf").desc, col("word"))
    termScores(docs, idCol, textCol)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("word"), round(col("tfidf"), 6).as("tfidf"))
  }
}

/** Frequency-ranked vocabulary construction — the seeding step of
  * WordPiece/SentencePiece-style tokenizer training: distinct tokens with
  * corpus counts and a deterministic dense id (rank by count desc, then
  * token asc, so id assignment is reproducible across runs and engines).
  *
  * Scale shape: the count aggregate is a distributed shuffle over all
  * token occurrences; the ranking window then runs over the PRUNED vocab
  * only (`minCount` removes the hapax long tail — by Heaps' law the
  * surviving vocabulary is sub-linear in corpus size and the global
  * ordering is a small job, not a corpus-wide single-partition sort).
  */
object Vocab {

  /** Corpus-wide (word, n) occurrence counts — the shared aggregation
    * behind word-frequency reports and vocab construction (one spelling,
    * so token-count semantics can't drift between them).
    */
  def wordCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))

  def build(
      docs: DataFrame,
      minCount: Long = 1L,
      textCol: String = "text"
  ): DataFrame =
    wordCounts(docs, textCol)
      .filter(col("n") >= minCount)
      .withColumn("token_id",
        row_number().over(Window.orderBy(col("n").desc, col("word"))))

  /** Token-id encoding of each document under a built vocab — the step
    * between [[build]] and `Packing`: text → the ordered token-id sequence
    * a training shard stores. OOV tokens (pruned below `minCount` at vocab
    * build) encode as -1 (UNK), counted per doc in `n_unk`.
    *
    * Scale shape: the vocab is minCount-pruned hence broadcastable, so the
    * corpus shuffles exactly once (the per-doc regroup); order is restored
    * from the explode position, never from row order. Docs with zero
    * tokens produce no row (there is no sequence to store).
    */
  def encode(
      docs: DataFrame,
      vocab: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame =
    docs
      .select(col(idCol),
        posexplode(TextFunctions.tokens(col(textCol))).as(Seq("pos", "word")))
      .join(broadcast(vocab.select(col("word"), col("token_id"))), Seq("word"), "left")
      .groupBy(col(idCol))
      .agg(
        sort_array(collect_list(struct(col("pos"),
          coalesce(col("token_id").cast("long"), lit(-1L)).as("tid")))).as("_z"),
        count(lit(1)).as("n_tokens"),
        sum(when(col("token_id").isNull, 1L).otherwise(0L)).as("n_unk"))
      .select(col(idCol), col("_z.tid").as("token_ids"),
        col("n_tokens"), col("n_unk"))
}
