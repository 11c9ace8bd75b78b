package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming tokenizer encode — the trained unigram table applied to a
  * LIVE document feed: tokenize each incoming text and Viterbi-segment
  * every word under the broadcast-as-literal piece table
  * ([[graft.expressions.UnigramSegment]]), emitting per-document token
  * accounting. STATELESS: one codegen'd projection, append mode, no
  * watermark, no state store — the shape that runs unchanged on a batch
  * frame or a `readStream` source (the LmScore.scoreStateless twin
  * discipline), which is exactly how a live ingestion pipeline meters
  * token budgets before sharding.
  *
  * A word the table cannot cover contributes 0 pieces (the kernel's
  * empty-array contract) — `n_uncovered` counts them so a feed drifting
  * away from the training charset is visible immediately.
  */
object StreamTokenize {

  /** `(doc_id, n_words, n_pieces, n_uncovered)` per document. Words
    * outside the training population ([[graft.operators.UnigramLm
    * .isTrainingWord]] — non-ASCII or longer than MaxWordLen) count as
    * uncovered with 0 pieces even when the kernel could segment them:
    * the table was never trained on them, and the oracle builds piece
    * counts from the training-word set only.
    */
  def pieceCounts(
      docs: DataFrame,
      table: Map[String, Long],
      maxPiece: Int = 4
  ): DataFrame = {
    val toks = graft.functions.TextFunctions.tokens(col("text"))
    val perWord = transform(toks, w =>
      when(graft.operators.UnigramLm.isTrainingWord(w),
        size(graft.expressions.UnigramSegment.segment(w, table, maxPiece)).cast("long"))
        .otherwise(lit(0L)))
    docs.select(
      col("doc_id"),
      size(toks).cast("long").as("n_words"),
      aggregate(perWord, lit(0L), (acc, v) => acc + v).as("n_pieces"),
      size(filter(perWord, v => v === 0L)).cast("long").as("n_uncovered"))
  }
}
