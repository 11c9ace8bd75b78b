package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Sliding-window document chunking — the retrieval/embedding prep step
  * (split long documents into fixed-size token windows with overlap so each
  * chunk fits an encoder's context and boundary sentences appear in two
  * chunks).
  *
  * Pure projection + explode: tokenize ONCE per document, then one
  * `transform(sequence(...))` materializes every window as a slice — zero
  * shuffles, stays inside WholeStageCodegen, parallelizes with the input
  * splits. Chunks start every `size − overlap` tokens; the tail chunk may be
  * short; empty documents produce no chunks.
  *
  * Reference scope: the reference never chunks (its TF-IDF consumes whole
  * documents); SURVEY §2.12 extension for the embedding/RAG pipeline.
  */
object Chunker {

  /** (idCols..., chunk_idx, chunk_text, n_chunk_tokens) — one row per
    * window of `size` tokens starting every `size − overlap` tokens.
    */
  def chunk(
      df: DataFrame,
      idCols: Seq[String],
      textCol: String,
      chunkSize: Int,
      overlap: Int
  ): DataFrame = {
    require(chunkSize > 0, "chunkSize must be positive")
    require(overlap >= 0 && overlap < chunkSize, "overlap in [0, chunkSize)")
    val stride = chunkSize - overlap
    val keyC = idCols.map(col)
    df.withColumn("_toks", TF.tokens(col(textCol)))
      .filter(col("_toks").isNotNull && size(col("_toks")) > 0)
      .select(keyC :+ explode(expr(
        s"transform(sequence(0, size(_toks) - 1, $stride)," +
          s" st -> named_struct('i', st DIV $stride, 'w', slice(_toks, st + 1, $chunkSize)))"))
        .as("_c"): _*)
      .select(keyC ++ Seq(
        col("_c.i").cast("long").as("chunk_idx"),
        array_join(col("_c.w"), " ").as("chunk_text"),
        size(col("_c.w")).cast("long").as("n_chunk_tokens")): _*)
  }
}
