package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Gopher repetition-removal gates on CHARACTER coverage (Rae et al. 2021,
  * "Scaling Language Models: ... Gopher", Appendix A1.2) — the second half
  * of the paper's filter battery, complementing [[GopherFilter]] (A1.1
  * quality gates) and [[Repetition]] (count-based fractions): the A1.2
  * rules are thresholds on the fraction of CHARACTERS covered by repeated
  * n-grams, which is what actually bounds wasted training tokens.
  * Reference behavior: the repetition-filter stage of the reference's
  * document-quality pipeline (count-based sibling: `Repetition.scores`).
  *
  * Metrics per document, over lowercased whitespace tokens:
  *  - `top{2,3,4}_char_frac`: (occurrences of the single most frequent
  *    word n-gram) × (its token characters) / (total token characters).
  *    Ties break to the lexicographically smallest n-gram. Overlapping
  *    occurrences are NOT deduplicated (the paper's convention — the
  *    ratio can exceed 1 on degenerate docs like "a a a a").
  *  - `dup{5..10}_char_frac`: characters of tokens covered by ANY word
  *    n-gram occurring ≥ 2 times in the document, each token position
  *    counted ONCE (interval union over start positions — the "take care
  *    not to count characters more than once" clause of the paper).
  *  - `reject_mask` ORs the failing gate bits (paper thresholds
  *    top: 0.20/0.18/0.16, dup: 0.15/0.14/0.13/0.12/0.11/0.10), each
  *    evaluated as a CROSS-MULTIPLIED integer comparison
  *    (covered·100 ≤ t·Σlen) — the reported fractions are one replayed
  *    floor-6 division each, but no float ever feeds a gate.
  *    Line/paragraph rules are omitted: the corpus is single-line
  *    (the `GopherFilter` adjudication).
  *
  * Scale shape: the whole operator is ONE zero-shuffle projection —
  * per-document HOF kernels (sort + run-length folds), no explode, no
  * join, no state — so it runs at scan speed over 100 TB and the n-gram
  * tables never leave the row. Worst-case per-doc cost is
  * O(L log L · |ns|) for the sorts plus O(L · D_n) for the dup-set
  * membership scan (D_n = distinct n-grams duplicated in THAT doc —
  * bounded by L/2; tiny on natural text).
  */
object RepetitionCoverage {

  /** (threshold percent, bit) per gate, in column order. */
  val TopThresholds: Seq[(Int, Int)] = Seq(2 -> 20, 3 -> 18, 4 -> 16)
  val DupThresholds: Seq[(Int, Int)] =
    Seq(5 -> 15, 6 -> 14, 7 -> 13, 8 -> 12, 9 -> 11, 10 -> 10)

  private def floor6(c: Column): Column =
    floor(c * lit(1000000.0d) + lit(0.5d)) / lit(1000000.0d)

  private val emptyStrings: Column = typedLit(Seq.empty[String])

  /** Word n-gram array (single-space joined), empty when the doc has
    * fewer than n tokens. 1-indexed start j covers tokens j..j+n-1.
    */
  private def grams(toks: Column, n: Int): Column = {
    val nG = size(toks) - (n - 1)
    // sequence(1, 0) would DESCEND — guard the short-doc case explicitly
    when(nG >= 1,
      transform(sequence(lit(1), nG), j => array_join(slice(toks, j, lit(n)), " ")))
      .otherwise(emptyStrings)
  }

  /** (count, token chars) of the most frequent n-gram: run-length fold
    * over the sorted gram array; a strictly-greater run updates, so the
    * FIRST maximal run in ascending order wins = smallest-gram tie-break.
    * Token chars of a gram = length − (n−1) joining spaces.
    */
  private def topCoveredChars(g: Column, n: Int): Column = {
    val folded = aggregate(
      array_sort(g),
      struct(lit("").as("prev"), lit(0L).as("run"),
        lit(0L).as("best"), lit("").as("bestg")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        val isNew = run > acc.getField("best")
        struct(x.as("prev"), run.as("run"),
          when(isNew, run).otherwise(acc.getField("best")).as("best"),
          when(isNew, x).otherwise(acc.getField("bestg")).as("bestg"))
      },
      acc => struct(acc.getField("best").as("best"),
        acc.getField("bestg").as("bestg")))
    val chars = length(folded.getField("bestg")).cast("long") - (n - 1).toLong
    when(folded.getField("best") > 0L, folded.getField("best") * chars)
      .otherwise(lit(0L))
  }

  /** Distinct n-grams occurring ≥ 2 times: run-fold over the sorted gram
    * array, appending each gram exactly when its run hits 2. The input is
    * evaluated once per row (aggregate's seed/input are not re-evaluated
    * per element — only the lambda body is).
    */
  private def dupGrams(g: Column): Column =
    aggregate(
      array_sort(g),
      struct(lit("").as("prev"), lit(0L).as("run"), emptyStrings.as("acc")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          when(run === 2L, concat(acc.getField("acc"), array(x)))
            .otherwise(acc.getField("acc")).as("acc"))
      },
      acc => acc.getField("acc"))

  /** Characters of tokens covered by any duplicated n-gram, each token
    * position counted once — an INTERVAL-MERGE fold over gram start
    * positions: dup start j covers tokens [j, j+n−1]; ascending j means
    * the newly-covered segment is [max(j, lastEnd+1), j+n−1], whose token
    * chars are summed with one slice per MERGED SEGMENT (the first
    * spelling probed membership per token position — O(L·n) slice
    * allocations/doc/n; this is O(dup starts + covered tokens)).
    * `toks` and `dStart` MUST be bound columns — the fold lambda
    * references them per element, and an inlined expression tree there is
    * re-evaluated per element (the SubstringDedup windowHashes lesson;
    * the first draft of this operator paid it at O(L⁴)/doc).
    */
  private def dupCoveredChars(toks: Column, dStart: Column, n: Int): Column = {
    val nG = size(dStart)
    when(nG >= 1,
      aggregate(
        sequence(lit(1), nG),
        struct(lit(0L).as("acc"), lit(0).as("lastEnd")),
        (st, j) => {
          val isDup = element_at(dStart, j)
          val lo = greatest(j, st.getField("lastEnd") + 1)
          val hi = j + lit(n - 1) // ≤ nTok since j ≤ nG = nTok − n + 1
          // lastEnd ≤ j+n−2 for ascending starts, so the segment is
          // non-empty whenever isDup; the when() keeps the slice lazy
          val segChars = aggregate(
            transform(slice(toks, lo, hi - lo + 1), t => length(t).cast("long")),
            lit(0L), (a, v) => a + v)
          struct(
            when(isDup, st.getField("acc") + segChars)
              .otherwise(st.getField("acc")).as("acc"),
            when(isDup, hi).otherwise(st.getField("lastEnd")).as("lastEnd"))
        },
        st => st.getField("acc"))).otherwise(lit(0L))
  }

  /** Per-document A1.2 gate table:
    * (doc_id, n_words, sum_len, top{2,3,4}_char_frac, dup{5..10}_char_frac,
    *  reject_mask, keep).
    *
    * Built on the native one-pass kernel
    * ([[graft.expressions.RepCoverage]]) — identical values to the staged
    * HOF spelling [[gatesHof]] (the spec pins kernel ≡ HOF on the fixture
    * corpus), at one tight loop per document instead of 9 expression-tree
    * folds.
    */
  def gates(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    // one kernel call bound as a column, fields projected in a SECOND
    // select — _k is referenced 11×, which (non-cheap, multi-use) is what
    // keeps CollapseProject from inlining the kernel per field
    val covered = docs
      .select(col(idCol),
        graft.expressions.RepCoverage.coverage(col(textCol)).as("_k"))
      .select(
        col(idCol) +:
          col("_k.n_words").as("n_words") +:
          col("_k.sum_len").as("sum_len") +:
          (TopThresholds.map { case (n, _) => col(s"_k.top$n").as(s"_top$n") } ++
            DupThresholds.map { case (n, _) => col(s"_k.dup$n").as(s"_dup$n") }): _*)
    finish(covered, idCol)
  }

  /** The staged-HOF spelling of [[gates]] (column functions only) — kept
    * as the kernel's cross-implementation witness.
    */
  def gatesHof(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val toks = col("_toks")
    val bound = docs.select(col(idCol),
      TextFunctions.tokens(col(textCol)).as("_toks"))
    // staged binds: gram arrays, then dup sets, then dup-start masks —
    // each stage's arrays become bound columns BEFORE a lambda references
    // them, so nothing is re-evaluated per fold element
    val withGrams = bound.select(
      col(idCol) +: toks +:
        size(toks).cast("long").as("n_words") +:
        aggregate(transform(toks, t => length(t).cast("long")), lit(0L),
          (acc, v) => acc + v).as("sum_len") +:
        (TopThresholds ++ DupThresholds).map { case (n, _) =>
          grams(toks, n).as(s"_g$n")
        }: _*)
    val withDupSets = withGrams.select(
      col(idCol) +: toks +: col("n_words") +: col("sum_len") +:
        (TopThresholds.map { case (n, _) => col(s"_g$n") } ++
          DupThresholds.map { case (n, _) => col(s"_g$n") } ++
          DupThresholds.map { case (n, _) =>
            dupGrams(col(s"_g$n")).as(s"_dg$n")
          }): _*)
    val withDupStarts = withDupSets.select(
      col(idCol) +: toks +: col("n_words") +: col("sum_len") +:
        (TopThresholds.map { case (n, _) => col(s"_g$n") } ++
          DupThresholds.map { case (n, _) =>
            // The empty-dup-set branch is not (only) an optimization: it
            // makes this projection reference _dg$n and _g$n TWICE, which
            // is what stops CollapseProject from inlining the dupGrams
            // fold into this lambda (single-use aliases collapse
            // regardless of cost, and an alias inlined into a HOF lambda
            // re-evaluates per element — O(L⁴)/doc measured on the first
            // draft; the SubstringDedup.windowHashes lesson).
            when(size(col(s"_dg$n")) === 0,
              transform(col(s"_g$n"), _ => lit(false)))
              .otherwise(transform(col(s"_g$n"),
                x => array_contains(col(s"_dg$n"), x))).as(s"_ds$n")
          }): _*)
    // covered-character integers — every gate and fraction derives from
    // these and sum_len, nothing else
    val covered = withDupStarts.select(
      col(idCol) +: col("n_words") +: col("sum_len") +:
        (TopThresholds.map { case (n, _) =>
          topCoveredChars(col(s"_g$n"), n).as(s"_top$n")
        } ++ DupThresholds.map { case (n, _) =>
          dupCoveredChars(toks, col(s"_ds$n"), n).as(s"_dup$n")
        }): _*)
    finish(covered, idCol)
  }

  /** Gates + fractions from the covered-character integer table
    * (idCol, n_words, sum_len, _top{2,3,4}, _dup{5..10}) — shared by the
    * kernel and HOF paths.
    */
  private def finish(covered: DataFrame, idCol: String): DataFrame = {
    val gateCols = (TopThresholds.map { case (n, t) => (s"_top$n", t) } ++
      DupThresholds.map { case (n, t) => (s"_dup$n", t) })
    val mask = gateCols.zipWithIndex.map { case ((c, t), i) =>
      when(col(c) * 100L <= lit(t.toLong) * col("sum_len"), 0L)
        .otherwise(lit(1L << i))
    }.reduce(_ + _)
    def frac(c: String): Column =
      when(col("sum_len") === 0L, lit(0.0d))
        .otherwise(floor6(col(c).cast("double") / col("sum_len").cast("double")))
    covered.select(
      col(idCol) +: col("n_words") +: col("sum_len") +:
        (TopThresholds.map { case (n, _) => frac(s"_top$n").as(s"top${n}_char_frac") } ++
          DupThresholds.map { case (n, _) => frac(s"_dup$n").as(s"dup${n}_char_frac") } ++
          Seq(mask.as("reject_mask"), (mask === 0L).as("keep"))): _*)
  }
}
