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

  /** Shannon entropy (bits/character) of the text's character
    * distribution — the compression-proxy quality signal: machine-generated
    * or repetitive garbage sits far below natural prose (English lands
    * around 4–4.5 bits/char), while encrypted/base64 noise sits near the
    * alphabet ceiling. Deterministic integer character counts, so the
    * whole signal SQL-oracles (round the output — the Σ p·log2 p fold is
    * a float sum).
    *
    * Takes the CHARACTER ARRAY, not the text: the count kernel references
    * the array once per distinct character, and a raw `split(text, "")`
    * argument would re-split per reference (the langId duplication
    * lesson) — callers bind `chars(text)` as a named column first.
    */
  def chars(text: Column): Column =
    filter(split(text, ""), c => length(c) > 0)

  def charEntropyFromChars(cs: Column): Column = {
    val n = size(cs)
    val counts = transform(array_distinct(cs), ch => size(filter(cs, x => x === ch)))
    // + 0.0 normalizes the single-distinct-char case: the fold yields
    // ±0.0, whose negation is -0.0, and repr(-0.0) ≠ repr(0.0) in the
    // driver's hash compare; IEEE -0.0 + 0.0 = +0.0 on both engines
    when(n === 0, lit(0.0)).otherwise(
      -aggregate(counts, lit(0.0),
        (acc, c) => acc + c.cast("double") / n * log2(c.cast("double") / n)) + lit(0.0))
  }

  /** n-gram/stopword language-ID heuristic over {en, es, de, fr, zh}.
    * CJK characters short-circuit to zh; otherwise argmax of function-word
    * hits per language (ties → alphabetical, deterministic).
    *
    * The argmax is `greatest` over `(score, rank, lang)` structs — rank
    * descends in alphabetical order so tied scores keep the earlier
    * language. The round-1 spelling folded nested `when`s whose accumulator
    * re-referenced every prior score subtree: Catalyst does not CSE across
    * `when` branches, so the score expressions duplicated exponentially
    * (15.7 s for 5k docs). `greatest` references each score once.
    *
    * `langIdFromTokens` takes a pre-tokenized column so callers scanning a
    * corpus project `tokens(text)` once instead of re-splitting per
    * language profile (5× regex work otherwise). [[withLangId]] is the
    * scale path: it projects the per-language scores as real columns first,
    * so the argmax duplicates only attribute refs, never the score kernels.
    */
  def langId(text: Column): Column =
    langIdFromTokens(tokens(text), text)

  def langIdFromTokens(toks: Column, text: Column): Column =
    argmaxLang(text, profiles.map { case (lang, words) =>
      lang -> size(filter(toks, t => t.isInCollection(words)))
    })

  private val profiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von"),
    "en" -> Seq("the", "and", "is", "of", "to", "in", "that", "it", "for", "with"),
    "es" -> Seq("el", "la", "los", "las", "de", "que", "y", "es", "en", "un"),
    "fr" -> Seq("le", "la", "les", "des", "et", "est", "que", "une", "dans", "pour")
  )

  private def argmaxLang(text: Column, scores: Seq[(String, Column)]): Column = {
    val n = scores.size
    val best = greatest(scores.zipWithIndex.map { case ((lang, sc), i) =>
      // rank = n - i: alphabetically earlier language outranks on tied scores
      struct(sc.as("score"), lit(n - i).as("rank"), lit(lang).as("lang"))
    }: _*)
    when(text.rlike("[\\u4e00-\\u9fff]"), lit("zh"))
      .when(best.getField("score") === 0, lit("und"))
      .otherwise(best.getField("lang"))
  }

  /** Corpus-scan language ID: tokenizes once, projects each language score
    * as its own column (a Project node CollapseProject keeps — each score
    * attribute is referenced twice by the argmax, and the score kernels are
    * not cheap, so they are never inlined back), then argmaxes over the
    * plain attribute refs. Linear in languages; stays in WholeStageCodegen.
    */
  def withLangId(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      outCol: String
  ): org.apache.spark.sql.DataFrame = {
    val toksCol = s"__${outCol}_toks"
    val scoreCol = (lang: String) => s"__${outCol}_s_$lang"
    val scored = profiles.foldLeft(df.withColumn(toksCol, tokens(col(textCol)))) {
      case (d, (lang, words)) =>
        d.withColumn(scoreCol(lang), size(filter(col(toksCol), t => t.isInCollection(words))))
    }
    scored
      .withColumn(outCol,
        argmaxLang(col(textCol), profiles.map { case (lang, _) => lang -> col(scoreCol(lang)) }))
      .drop(toksCol +: profiles.map(p => scoreCol(p._1)): _*)
  }

  private val FpPrime = 2147483629L // largest prime < 2^31: keeps acc*31+h in long range

  /** Order-sensitive document fingerprint: polynomial rolling hash over
    * tokens, mod a 31-bit prime (overflow-free under ANSI mode). Documents
    * equal after whitespace normalization hash equal; any token change or
    * reorder changes the fingerprint. Native one-pass kernel (the HOF twin
    * below evaluates an expression tree per token — 6 s / 5k docs).
    */
  def fingerprint(text: Column): Column =
    graft.expressions.TextSketches.fingerprint64(text)

  /** `aggregate`-HOF spelling of [[fingerprint]] — identical math, kept as
    * the cross-implementation oracle for the kernel's equivalence spec.
    */
  private[graft] def fingerprintHof(text: Column): Column =
    aggregate(
      tokens(text),
      lit(0L),
      (acc, t) => pmod(acc * 31L + pmod(xxhash64(t), lit(FpPrime)), lit(FpPrime))
    )

  /** Portable fingerprint: the same polynomial fold as [[fingerprint]] but
    * with a 48-bit-md5 token hash instead of xxhash64, so the exact value
    * reproduces in ANY engine (q_fingerprints_md5's DuckDB oracle spells it
    * with list_reduce) — the cross-system spelling for pipeline handoffs,
    * where the xxhash variant stays the fast intra-Spark default. Zero
    * shuffle; built-in codegen'd HOFs only.
    */
  def fingerprintPortable(text: Column): Column =
    aggregate(
      tokens(text),
      lit(0L),
      (acc, t) => pmod(
        acc * 31L + pmod(graft.operators.HashSplit.md548(t), lit(FpPrime)),
        lit(FpPrime))
    )

  /** md5-48 hashes of the whitespace tokens — bind this ONCE as a named
    * column before folding over it ([[simhash48FromHashes]]): a HOF lambda
    * re-evaluates its argument per element, and 48 bit-folds over an
    * inlined `transform(tokens(text), md548)` would run the tokenizer and
    * md5 48× per document (the windowHashes lesson).
    */
  def md548Tokens(text: Column): Column =
    transform(tokens(text), t => graft.operators.HashSplit.md548(t))

  /** Portable 48-bit SimHash (Charikar 2002) from a bound md5-48 hash
    * array: bit j of the output is the sign of Σ over token POSITIONS of
    * (±1 per bit j of the token's hash) — the [[fingerprintPortable]]
    * story applied to the SimHash sketch: md5-48 reproduces in any engine,
    * so the exact signature hash-oracles (q_simhash_md5), while the
    * xxhash64 kernel ([[graft.expressions.TextSketches.simhash64]]) stays
    * the fast intra-Spark default. Zero shuffle; 48 integer folds over the
    * already-hashed array, built-in codegen'd HOFs only. Empty documents
    * sign to 0 on every bit → signature 0 in both engines.
    */
  def simhash48FromHashes(hs: Column): Column =
    (0 until 48).map { j =>
      val cj = aggregate(hs, lit(0L), (acc, h) =>
        acc + when(shiftright(h, j).bitwiseAND(lit(1L)) === 1L, lit(1L)).otherwise(lit(-1L)))
      when(cj > 0L, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Distinct word 3-shingles as a bound column — the minhash kernel's
    * shingling contract (docs shorter than w contribute their whole
    * normalized text as the single shingle, so no doc is shingle-less)
    * spelled with built-in HOFs for cross-engine replay. Bind ONCE before
    * folding ([[minhash48Lanes]] folds 16× over it).
    */
  def shingles3(toks: Column): Column =
    when(size(toks) < 3, array(concat_ws(" ", toks)))
      .otherwise(array_distinct(transform(
        sequence(lit(0), size(toks) - 3),
        i => concat_ws(" ", slice(toks, i + 1, lit(3))))))

  /** Portable MinHash lanes (Broder 1997) from a bound shingle array: lane
    * i's value is min over shingles of md5-48("i <shingle>") — lane-salted
    * md5 instead of the kernel's (a·h+b) mod p universal hashes, so there
    * is NO multiply to overflow and the exact lane minima reproduce in any
    * engine (q_minhash_md5_sigs; the [[fingerprintPortable]] /
    * [[simhash48FromHashes]] portability story completing the sketch
    * trilogy). Zero shuffle: a per-row projection of `nLanes` integer
    * folds; the xxhash64 kernel (TextSketches.minhashSignature) stays the
    * fast intra-Spark default for banding.
    */
  def minhash48Lanes(shingles: Column, nLanes: Int = 16): Seq[Column] =
    (0 until nLanes).map { i =>
      array_min(transform(shingles, s =>
        graft.operators.HashSplit.md548(concat_ws(" ", lit(i.toString), s))))
        .as(s"mh$i")
    }
}
