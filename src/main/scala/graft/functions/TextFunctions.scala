package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data pipelines.
  * All pure Catalyst expressions (codegen'd, no UDFs) — they stay inside
  * WholeStageCodegen and scale linearly with bytes scanned.
  */
object TextFunctions {

  /** Whitespace tokenization (lowercased). Empty string → empty array. */
  def tokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => length(t) > 0)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: words + digit runs + punctuation runs counted
    * separately (a cheap proxy for tokenizer token counts; public trick —
    * regex segmentation similar to GPT-2's pre-tokenizer classes).
    */
  def subwordCount(text: Column): Column =
    size(filter(split(lower(text), "(?=[^a-z0-9])|(?<=[^a-z0-9])"), t => length(trim(t)) > 0))

  def avgTokenLength(text: Column): Column = {
    val n = tokenCount(text)
    when(n === 0, lit(0.0))
      .otherwise(length(regexp_replace(trim(text), "\\s+", "")).cast("double") / n)
  }

  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(
        (length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double") /
          length(text)
      )

  def upperRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(
        (length(text) - length(regexp_replace(text, "[A-Z]", ""))).cast("double") / length(text)
      )

  private val enStop = Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")

  def stopwordCount(text: Column, stopwords: Seq[String] = enStop): Column =
    size(filter(tokens(text), t => t.isInCollection(stopwords)))

  def stopwordRatio(text: Column, stopwords: Seq[String] = enStop): Column = {
    val n = tokenCount(text)
    when(n === 0, lit(0.0)).otherwise(stopwordCount(text, stopwords).cast("double") / n)
  }

  /** Heuristic quality score in [0,1]: documents that are too short, mostly
    * punctuation, or stopword-free (word-salad) score low. Weights are the
    * usual hand-tuned pipeline heuristics (C4/Gopher-style length, symbol and
    * stopword rules — public filtering recipes), not learned.
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text)
    val lengthOk = when(nTok >= 50, 1.0).when(nTok >= 10, 0.7).when(nTok >= 3, 0.3).otherwise(0.0)
    val punctOk = when(punctRatio(text) <= 0.2, lit(1.0)).otherwise(lit(0.3))
    val stopOk = when(stopwordRatio(text) >= 0.05, lit(1.0)).otherwise(lit(0.5))
    val wordLenOk = when(avgTokenLength(text).between(2.0, 12.0), lit(1.0)).otherwise(lit(0.4))
    round(lengthOk * 0.4 + punctOk * 0.2 + stopOk * 0.2 + wordLenOk * 0.2, 4)
  }

  /** n-gram/stopword language-ID heuristic over {en, es, de, fr, zh}.
    * CJK characters short-circuit to zh; otherwise argmax of function-word
    * hits per language (ties → alphabetical, deterministic).
    *
    * `langIdFromTokens` takes a pre-tokenized column so callers scanning a
    * corpus project `tokens(text)` once instead of re-splitting per
    * language profile (5× regex work otherwise).
    */
  def langId(text: Column): Column =
    langIdScores(tokens(text), text)

  def langIdFromTokens(toks: Column, text: Column): Column =
    langIdScores(toks, text)

  private def langIdScores(toks: Column, text: Column): Column = {
    val profiles: Seq[(String, Seq[String])] = Seq(
      "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von"),
      "en" -> Seq("the", "and", "is", "of", "to", "in", "that", "it", "for", "with"),
      "es" -> Seq("el", "la", "los", "las", "de", "que", "y", "es", "en", "un"),
      "fr" -> Seq("le", "la", "les", "des", "et", "est", "que", "une", "dans", "pour")
    )
    val scores = profiles.map { case (lang, words) =>
      lang -> size(filter(toks, t => t.isInCollection(words)))
    }
    val best = scores.tail.foldLeft[Column](
      struct(scores.head._2.as("score"), lit(scores.head._1).as("lang"))
    ) { case (acc, (lang, score)) =>
      // strict > keeps the earlier (alphabetical) language on ties
      when(score > acc.getField("score"), struct(score.as("score"), lit(lang).as("lang")))
        .otherwise(acc)
    }
    when(text.rlike("[\\u4e00-\\u9fff]"), lit("zh"))
      .when(best.getField("score") === 0, lit("und"))
      .otherwise(best.getField("lang"))
  }

  private val FpPrime = 2147483629L // largest prime < 2^31: keeps acc*31+h in long range

  /** Order-sensitive document fingerprint: polynomial rolling hash over
    * tokens, mod a 31-bit prime (overflow-free under ANSI mode). Documents
    * equal after whitespace normalization hash equal; any token change or
    * reorder changes the fingerprint.
    */
  def fingerprint(text: Column): Column =
    aggregate(
      tokens(text),
      lit(0L),
      (acc, t) => pmod(acc * 31L + pmod(xxhash64(t), lit(FpPrime)), lit(FpPrime))
    )
}
