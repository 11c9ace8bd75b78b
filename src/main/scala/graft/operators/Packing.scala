package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Sequence-packing index for pretraining batches: documents are
  * concatenated in a deterministic order and split into fixed `seqLen`
  * token windows (the GPT-style concat-and-split packing). This operator
  * computes, per document, its token count, start offset in the
  * concatenated stream, the training sequence its first token lands in,
  * and whether it straddles a sequence boundary — everything a loader
  * needs to materialize packed batches, without materializing them.
  *
  * Packing runs per `groupCol` shard (language here, tokenizer-shard or
  * file-shard in production): the running-sum window partitions by the
  * shard, so no global single-partition cumsum exists — each shard's
  * stream is independent, which is also what keeps shards loadable in
  * isolation at training time.
  */
object Packing {

  def packingIndex(
      docs: DataFrame,
      seqLen: Int,
      groupCol: String = "lang",
      orderCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col(orderCol), col(groupCol),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("start_offset", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("seq_idx", floor(col("start_offset") / seqLen))
      .withColumn("straddles",
        col("n_tokens") > 0 &&
          floor((col("start_offset") + col("n_tokens") - 1) / seqLen) =!= col("seq_idx"))
  }
}
