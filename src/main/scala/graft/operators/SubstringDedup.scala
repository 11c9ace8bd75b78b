package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Exact-substring duplication detection and removal (Lee et al. 2021,
  * "Deduplicating Training Data Makes Language Models Better" — their
  * suffix-array pass, re-expressed for a shared-nothing engine as rolling
  * w-token window hashes): a span of text is duplicated when every w-token
  * window inside it also occurs in at least `minDocs - 1` OTHER documents;
  * overlapping and adjacent duplicated windows merge into maximal spans
  * (gaps-and-islands), which [[removeSpans]] cuts out of the corpus.
  *
  * Scale shape: the window explode is linear in corpus tokens (a doc of n
  * tokens yields n-w+1 windows) and shuffles once on the window hash for
  * the distinct-doc count — never a doc-pair join, so a phrase shared by a
  * million documents costs one aggregate row, not 10^12 pairs. Span
  * merging is one per-doc window over only the DUPLICATED windows (a small
  * fraction of the corpus). Window hashing is md5 over the space-joined
  * tokens — cross-engine stable, so the whole pipeline is SQL-oracled.
  */
object SubstringDedup {

  private def toks(textCol: String): Column = TextFunctions.tokens(col(textCol))

  /** (id, pos, h): md5 of every w-token rolling window, 0-based start
    * position. Docs shorter than w yield no rows. Zero-shuffle explode.
    */
  def windowHashes(
      docs: DataFrame,
      w: Int,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    require(w >= 2, s"window width $w must be >= 2")
    // tokenize in a SEPARATE projection: a higher-order-function lambda
    // re-evaluates its whole body per element, so inlining tokens(text)
    // into the transform below would regex-split the document once per
    // WINDOW — O(n²) per doc. Bound as a column it's once per row, and
    // CollapseProject keeps the stage split (the column is referenced
    // several times and is non-cheap).
    val t = col("_toks")
    // sequence(0, n) runs DESCENDING when n < 0 — guard short docs explicitly
    val idx = when(size(t) >= w, sequence(lit(0), size(t) - w))
      .otherwise(array().cast("array<int>"))
    val wins = transform(idx, i =>
      struct(i.as("pos"), md5(concat_ws(" ", slice(t, i + 1, lit(w)))).as("h")))
    docs
      .select(col(idCol), toks(textCol).as("_toks"))
      .select(col(idCol), explode(wins).as("w"))
      .select(col(idCol), col("w.pos").as("pos"), col("w.h").as("h"))
  }

  /** Maximal duplicated spans per document: windows whose hash appears in
    * ≥ `minDocs` DISTINCT documents (cross-document duplication — a phrase
    * repeated only within one doc is [[Repetition]]'s business), merged
    * when overlapping or adjacent. Returns (id, span_start, span_end,
    * n_windows) with token-index bounds inclusive.
    */
  def duplicatedSpans(
      docs: DataFrame,
      w: Int,
      minDocs: Int = 2,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    // persisted: both the distinct-doc aggregate and the semi-join back
    // read the window hashes — without the cache the tokenize + per-window
    // md5 scan (the pipeline's dominant cost) runs twice. Lifecycle: the
    // returned frame consumes the cache lazily, so the blocks live until
    // the session drops them — Bench/Verify clearCache() per query; a
    // long-lived session should clearCache after materializing.
    val wh = windowHashes(docs, w, idCol, textCol).persist()
    // one hash-shuffle; a hash shared by millions of docs is still one
    // aggregate row — there is no pairwise materialization anywhere
    val dup = wh.groupBy(col("h"))
      .agg(countDistinct(col(idCol)).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("h"))
    val dw = wh.join(dup, Seq("h"), "left_semi")
    mergeWindows(dw.select(col(idCol), col("pos")), w, idCol)
  }

  /** Gaps-and-islands merge of matched `(idCol, pos)` windows into maximal
    * spans: a window starts a new span when it neither overlaps nor
    * touches the running max end. Shared by [[duplicatedSpans]] and
    * [[Memorization]] — one spelling of the span semantics. Returns
    * (idCol, span_start, span_end, n_windows), token bounds inclusive.
    */
  private[operators] def mergeWindows(
      dw: DataFrame,
      w: Int,
      idCol: String
  ): DataFrame = {
    val before = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val upTo = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prevEnd = coalesce(max(col("pos") + lit(w - 1)).over(before), lit(-2))
    dw.withColumn("ns", when(col("pos") > prevEnd + 1, 1).otherwise(0))
      .withColumn("g", sum(col("ns")).over(upTo))
      .groupBy(col(idCol), col("g"))
      .agg(
        min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(w - 1)).as("span_end"),
        count(lit(1)).as("n_windows"))
      .drop("g")
  }

  /** Distinct ids of documents containing ≥1 cross-document duplicated
    * window — exactly the membership set `duplicatedSpans(...).select(id)
    * .distinct()` yields, WITHOUT the span merge: no per-doc sort window,
    * no island groupBy. The method-overlap audit (and any flag-set
    * consumer) only needs membership, so the spans stage is pure overhead
    * there. Same persist discipline as [[duplicatedSpans]] (the window
    * scan feeds the distinct-doc aggregate and the semi-join back).
    */
  def duplicatedDocIds(
      docs: DataFrame,
      w: Int,
      minDocs: Int = 2,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val wh = windowHashes(docs, w, idCol, textCol).persist()
    val dup = wh.groupBy(col("h"))
      .agg(countDistinct(col(idCol)).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("h"))
    wh.join(dup, Seq("h"), "left_semi").select(col(idCol)).distinct()
  }

  /** The corpus with duplicated spans cut out: every token whose position
    * falls inside any of its document's spans is dropped, the remainder
    * re-joined in order. Returns (id, n_tokens, n_removed, clean_md5) —
    * the cleaned text is reported as its md5 so downstream compares stay
    * cheap; a fully-duplicated doc cleans to the empty string.
    */
  def removeSpans(
      docs: DataFrame,
      w: Int,
      minDocs: Int = 2,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val spans = duplicatedSpans(docs, w, minDocs, idCol, textCol)
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("spans"))
    val emptySpans = array().cast("array<struct<span_start:int,span_end:int>>")
    docs
      .select(col(idCol), toks(textCol).as("toks"))
      .join(spans, Seq(idCol), "left")
      .withColumn("sp", coalesce(col("spans"), emptySpans))
      .select(
        col(idCol),
        size(col("toks")).as("n_tokens"),
        filter(col("toks"), (t, i) =>
          !exists(col("sp"), s =>
            i >= s.getField("span_start") && i <= s.getField("span_end"))).as("kept"))
      .select(
        col(idCol),
        col("n_tokens"),
        (col("n_tokens") - size(col("kept"))).as("n_removed"),
        md5(concat_ws(" ", col("kept"))).as("clean_md5"))
  }

  /** The paper's HEADLINE measurement (Lee et al. 2021 report it per
    * corpus): the fraction of w-gram positions whose w-gram occurs more
    * than once in the whole corpus (within- OR cross-document), broken out
    * per source — the duplication profile a curation report leads with.
    * Returns (source, n_positions, n_dup_positions, dup_frac floor-6).
    *
    * Scale shape: everything happens on AGGREGATED hash tables — per
    * (source, hash) counts, then per-hash totals, then one join of the two
    * pre-aggregated frames on the hash. Positions are never joined back
    * row-wise, so a hash shared by millions of positions is one row end to
    * end. The one replayed float is the final division (floor-6).
    */
  def dupNgramStats(
      docs: DataFrame,
      w: Int,
      idCol: String = "doc_id",
      textCol: String = "text",
      srcCol: String = "source"
  ): DataFrame = {
    require(w >= 2, s"window width $w must be >= 2")
    val t = col("_toks")
    val idx = when(size(t) >= w, sequence(lit(0), size(t) - w))
      .otherwise(array().cast("array<int>"))
    val wins = transform(idx, i => md5(concat_ws(" ", slice(t, i + 1, lit(w)))))
    val bySrcHash = docs
      .select(col(srcCol), toks(textCol).as("_toks"))
      .select(col(srcCol), explode(wins).as("h"))
      .groupBy(col(srcCol), col("h"))
      .agg(count(lit(1)).as("c_sh"))
    val byHash = bySrcHash.groupBy(col("h")).agg(sum(col("c_sh")).as("c_h"))
    bySrcHash
      .join(byHash, Seq("h"))
      .groupBy(col(srcCol))
      .agg(
        sum(col("c_sh")).as("n_positions"),
        sum(when(col("c_h") >= 2L, col("c_sh")).otherwise(0L)).as("n_dup_positions"))
      .select(col(srcCol), col("n_positions"), col("n_dup_positions"),
        (floor(col("n_dup_positions").cast("double") / col("n_positions").cast("double")
          * lit(1000000.0d) + lit(0.5d)) / lit(1000000.0d)).as("dup_frac"))
  }
}
