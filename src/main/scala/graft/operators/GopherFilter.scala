package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Gopher-rule document quality gates (Rae et al. 2021, "Scaling Language
  * Models: ... Gopher", Appendix A1.1) — the published heuristic filter
  * battery every large-scale text pipeline runs before training. Reference
  * behavior: the quality-filter stage of the reference's document pipeline
  * (the qualityScore heuristic is the soft-score sibling; these are the
  * hard gates with the paper's thresholds).
  *
  * Engine-exactness: every gate is an INTEGER comparison — threshold
  * ratios are cross-multiplied (mean word length in [3,10] becomes
  * 3·n ≤ Σlen ∧ Σlen ≤ 10·n), so no float is ever computed and the whole
  * operator hash-oracles without rounding. Zero-shuffle: one projection
  * over the scan, codegen'd HOF kernels, no UDFs.
  *
  * Scale shape: linear in bytes scanned, embarrassingly parallel; at
  * 100 TB this runs at scan speed with filters/pruning reaching parquet.
  *
  * Gates (paper thresholds; line/bullet rules are omitted because the
  * corpus is single-line — documented, not silently passed):
  *   1 word count in [50, 100 000]
  *   2 mean word length in [3, 10]
  *   4 symbol-to-word ratio ≤ 0.1 (symbols: '#' and '…')
  *   8 ≥ 80 % of words contain an alphabetic character
  *  16 contains ≥ 2 distinct words of the paper's 8-word stop list
  * `reject_mask` ORs the failing gate bits; `keep` = mask == 0.
  */
object GopherFilter {

  /** The paper's stop list (A1.1): "the, be, to, of, and, that, have, with". */
  val GopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Per-document gate table:
    * (doc_id, n_words, g_word_count, g_word_len, g_symbol, g_alpha,
    *  g_stop, reject_mask, keep).
    */
  def gates(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val toks = col("_toks")
    // exact integer sufficient statistics — bind tokens once per row (the
    // HOF-re-evaluation lesson from SubstringDedup.windowHashes)
    val stats = docs
      .select(col(idCol), col(textCol).as("_text"),
        TextFunctions.tokens(col(textCol)).as("_toks"))
      .select(
        col(idCol),
        size(toks).cast("long").as("n_words"),
        aggregate(transform(toks, t => length(t).cast("long")), lit(0L),
          (acc, v) => acc + v).as("sum_len"),
        size(filter(toks, t => t.rlike("[a-z]"))).cast("long").as("n_alpha"),
        (charCount(col("_text"), "#") + charCount(col("_text"), "…"))
          .as("n_sym"),
        size(filter(
          array(GopherStops.map(lit): _*),
          s => array_contains(toks, s))).cast("long").as("n_stop"))
    val gWordCount = col("n_words").between(50L, 100000L)
    val gWordLen = (lit(3L) * col("n_words") <= col("sum_len")) &&
      (col("sum_len") <= lit(10L) * col("n_words"))
    val gSymbol = lit(10L) * col("n_sym") <= col("n_words")
    val gAlpha = lit(5L) * col("n_alpha") >= lit(4L) * col("n_words")
    val gStop = col("n_stop") >= 2L
    val mask =
      when(gWordCount, 0L).otherwise(1L) +
        when(gWordLen, 0L).otherwise(2L) +
        when(gSymbol, 0L).otherwise(4L) +
        when(gAlpha, 0L).otherwise(8L) +
        when(gStop, 0L).otherwise(16L)
    stats.select(
      col(idCol), col("n_words"),
      gWordCount.as("g_word_count"),
      gWordLen.as("g_word_len"),
      gSymbol.as("g_symbol"),
      gAlpha.as("g_alpha"),
      gStop.as("g_stop"),
      mask.as("reject_mask"),
      (mask === 0L).as("keep"))
  }

  /** Occurrences of the single character `ch` in `text`, as BIGINT
    * (translate = non-regex single-char removal, same on both engines).
    */
  private def charCount(text: Column, ch: String): Column =
    (length(text) - length(translate(text, ch, ""))).cast("long")
}
