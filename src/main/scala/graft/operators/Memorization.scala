package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Verbatim-memorization / extraction audit (Carlini et al. 2021
  * "Extracting Training Data from Large Language Models"; Lee et al. 2022
  * report the same metric per-span): for each CANDIDATE document — an
  * eval item or a model generation — find every maximal token span that
  * appears verbatim anywhere in the training CORPUS. This is the
  * reverse-direction composition of the exact-substring dedup: instead of
  * asking "which corpus spans repeat?", it asks "how much of THIS text is
  * a copy of the corpus?" — the audit a release runs over model samples
  * (memorization rate) and over eval suites (verbatim leakage the
  * shingle-fraction gate under-reports because it ignores contiguity).
  *
  * Mechanics: the same rolling w-token md5 window hashes as
  * [[SubstringDedup.windowHashes]] on both sides; a candidate window HITS
  * iff its hash is in the corpus window-hash set — one distinct + one
  * hash equi-join, NEVER a candidate×corpus doc-pair join; hits merge
  * gaps-and-islands ([[SubstringDedup.mergeWindows]], the one spelling of
  * span semantics) into maximal spans. At 100 TB the corpus side is one
  * shuffle of (hash) — the cost the substring dedup already pays — and
  * the candidate side is usually tiny.
  */
object Memorization {

  /** Maximal verbatim spans per candidate: (idCol, span_start, span_end,
    * n_windows), token bounds inclusive. Candidates with no hit yield no
    * rows — [[report]] re-attaches them with zeros.
    */
  def memorizedSpans(
      candidates: DataFrame,
      corpus: DataFrame,
      w: Int = 8,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val corpusH = SubstringDedup.windowHashes(corpus, w, idCol, textCol)
      .select(col("h")).distinct()
    val hits = SubstringDedup.windowHashes(candidates, w, idCol, textCol)
      .join(corpusH, Seq("h"), "left_semi")
    SubstringDedup.mergeWindows(hits.select(col(idCol), col("pos")), w, idCol)
  }

  /** Per-candidate audit — EVERY candidate appears, clean ones with
    * zeros: idCol, n_tokens, n_spans, n_mem_tokens, longest_span,
    * mem_frac_e6 (memorized-token fraction in exact ppm).
    */
  def report(
      candidates: DataFrame,
      corpus: DataFrame,
      w: Int = 8,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val per = memorizedSpans(candidates, corpus, w, idCol, textCol)
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_spans"),
        sum(col("span_end") - col("span_start") + lit(1)).cast("long")
          .as("n_mem_tokens"),
        max(col("span_end") - col("span_start") + lit(1)).cast("long")
          .as("longest_span"))
    candidates
      .select(col(idCol),
        size(TextFunctions.tokens(col(textCol))).cast("long").as("n_tokens"))
      .join(per, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_mem_tokens"), lit(0L)).as("n_mem_tokens"),
        coalesce(col("longest_span"), lit(0L)).as("longest_span"))
      .withColumn("mem_frac_e6",
        when(col("n_tokens") > 0L,
          expr("n_mem_tokens * 1000000 DIV n_tokens")).otherwise(lit(0L)))
  }
}
