package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generation-eval n-gram overlap metrics — corpus BLEU-4 (Papineni et al.
  * 2002: clipped modified n-gram precision + brevity penalty) and ROUGE-N
  * (Lin 2004: per-pair precision/recall/F1, macro-averaged) — the two
  * standard text-overlap scores an LLM training pipeline runs over
  * (candidate, reference) pairs when grading model outputs or filtering
  * synthetic data against its seed corpus.
  *
  * Pairing is deterministic and data-derived (no model outputs exist in
  * the corpus): each even `doc_id` is the CANDIDATE and `doc_id + 1` its
  * REFERENCE — a pure function of the table, so the whole metric replays
  * bit-for-bit in any engine. A real deployment swaps [[pairDocs]] for its
  * own (candidate, reference) join; everything downstream is unchanged.
  *
  * Scale shape: candidate and reference live in the SAME pair row, so
  * every order's clipped-match count comes from ONE native kernel pass
  * per row ([[graft.expressions.OverlapKernels]], codegen'd) — a
  * (pair, n, gram) counting join would shuffle the whole gram volume for
  * values the kernel computes at scan speed. The only shuffles are the
  * doc-successor pair join and the final per-source aggregate (map-side
  * combined to |sources| rows). Per-pair doubles are quantized to e6
  * BIGINTs before the per-source average so every cross-partition sum is
  * exact integer arithmetic (order-independent, engine-portable).
  */
object Bleu {

  val MaxN = 4

  /** Adjacent-doc candidate/reference pairing: even doc_id = candidate,
    * doc_id + 1 = reference. Inner join — an even doc with no successor
    * simply contributes no pair (same semantics in the SQL oracle).
    * `cand`/`ref` are the raw texts; the overlap kernels tokenize.
    */
  def pairDocs(docs: DataFrame): DataFrame = {
    val a = docs.select(col("doc_id"), col("source"), col("text")).as("a")
    val b = docs.select(col("doc_id"), col("text")).as("b")
    a.join(b, col("a.doc_id") + lit(1) === col("b.doc_id"))
      .where(col("a.doc_id") % 2 === 0)
      .select(
        col("a.doc_id").as("pair_id"),
        col("a.source").as("source"),
        col("a.text").as("cand"),
        col("b.text").as("ref"))
  }

  private val emptyStrings: Column = typedLit(Seq.empty[String])

  /** Word n-gram array (single-space joined), empty when the doc has
    * fewer than n tokens.
    */
  def grams(toks: Column, n: Int): Column = {
    val nG = size(toks) - (n - 1)
    // sequence(1, 0) would DESCEND — guard the short-doc case explicitly
    when(nG >= 1,
      transform(sequence(lit(1), nG), j => array_join(slice(toks, j, lit(n)), " ")))
      .otherwise(emptyStrings)
  }

  /** Multiset-intersection size of two gram arrays — the clipped match
    * count Σ_g min(count_a(g), count_b(g)) — as ONE per-row expression:
    * tag each side, sort the combined struct array (gram, then side),
    * run-length fold closing each equal-gram run with min(run_a, run_b).
    *
    * PARITY REFERENCE ONLY: the hot paths use the native
    * [[graft.expressions.OverlapKernels]] (BleuSpec pins kernel ≡ fold).
    * This HOF spelling allocates a struct per element and runs
    * interpreted — the chrF variant benched 17.9 s at sf0.1 where the
    * kernel is sub-second (the RepCoverage lesson repeating).
    */
  def clippedMatch(a: Column, b: Column): Column = {
    val tagged = array_sort(concat(
      transform(a, g => struct(g.as("g"), lit(1).as("s"))),
      transform(b, g => struct(g.as("g"), lit(2).as("s")))))
    aggregate(
      tagged,
      struct(lit("").as("prev"), lit(0L).as("ca"), lit(0L).as("cb"),
        lit(0L).as("acc"), lit(false).as("open")),
      (st, e) => {
        val isNew = !st.getField("open") || (e.getField("g") =!= st.getField("prev"))
        struct(
          e.getField("g").as("prev"),
          (when(isNew, lit(0L)).otherwise(st.getField("ca")) +
            when(e.getField("s") === 1, 1L).otherwise(0L)).as("ca"),
          (when(isNew, lit(0L)).otherwise(st.getField("cb")) +
            when(e.getField("s") === 2, 1L).otherwise(0L)).as("cb"),
          (st.getField("acc") +
            when(isNew, least(st.getField("ca"), st.getField("cb"))).otherwise(lit(0L))).as("acc"),
          lit(true).as("open"))
      },
      st => st.getField("acc") + least(st.getField("ca"), st.getField("cb")))
  }

  /** Per-(pair, n) clipped-match and total gram counts: `m` = Σ_gram
    * min(count_cand, count_ref) via the native word-overlap kernel (one
    * pass for every order), `tc`/`tr` from the kernel's token counts. A
    * pure projection — the long (pair, n) format unfolds from a
    * literal-array explode, never a join.
    */
  def clippedStats(pairs: DataFrame, maxN: Int = MaxN): DataFrame =
    pairs.select(col("pair_id"), col("source"),
      graft.expressions.OverlapKernels.wordOverlap(col("cand"), col("ref")).as("ov"))
      .select(col("pair_id"), col("source"),
        explode(array((1 to maxN).map { n =>
          struct(lit(n).as("n"), col(s"ov.m$n").as("m"),
            greatest(col("ov.nc") - (n - 1), lit(0L)).as("tc"),
            greatest(col("ov.nr") - (n - 1), lit(0L)).as("tr"))
        }: _*)).as("st"))
      .select(col("pair_id"), col("source"), col("st.n").as("n"),
        col("st.m").as("m"), col("st.tc").as("tc"), col("st.tr").as("tr"))

  /** Corpus BLEU-4 per source: p_n from source-summed clipped counts,
    * brevity penalty from total candidate/reference token counts, zero
    * when any order has no match (the standard unsmoothed definition).
    * All pre-`exp` sums are BIGINTs; the ln-sum is spelled left-to-right
    * so both engines accumulate in the same order.
    */
  def corpusBleu(docs: DataFrame): DataFrame = {
    val stats = clippedStats(pairDocs(docs))
    val agg = stats
      .groupBy(col("source"))
      .agg(
        // each pair contributes exactly one n = 1 row — no countDistinct
        sum(when(col("n") === 1, 1L)).as("n_pairs"),
        sum(when(col("n") === 1, col("m"))).as("m1"),
        sum(when(col("n") === 2, col("m"))).as("m2"),
        sum(when(col("n") === 3, col("m"))).as("m3"),
        sum(when(col("n") === 4, col("m"))).as("m4"),
        sum(when(col("n") === 1, col("tc"))).as("t1"),
        sum(when(col("n") === 2, col("tc"))).as("t2"),
        sum(when(col("n") === 3, col("tc"))).as("t3"),
        sum(when(col("n") === 4, col("tc"))).as("t4"),
        sum(when(col("n") === 1, col("tr"))).as("ref_tokens"))
    def p(m: Column, t: Column): Column =
      when(t > 0, m.cast("double") / t.cast("double")).otherwise(lit(0.0))
    val p1 = p(col("m1"), col("t1")); val p2 = p(col("m2"), col("t2"))
    val p3 = p(col("m3"), col("t3")); val p4 = p(col("m4"), col("t4"))
    val bp = when(col("t1") === 0, lit(0.0))
      .when(col("t1") >= col("ref_tokens"), lit(1.0))
      .otherwise(exp(lit(1.0) - col("ref_tokens").cast("double") / col("t1").cast("double")))
    // LEAST, not a product, so the zero test can't overflow at huge SF
    val anyZero = least(col("m1"), col("m2"), col("m3"), col("m4")) === 0
    val bleu = when(anyZero, lit(0.0))
      .otherwise(bp * exp(lit(0.25) * (((log(p1) + log(p2)) + log(p3)) + log(p4))))
    agg.select(
      col("source"), col("n_pairs"),
      col("t1").as("cand_tokens"), col("ref_tokens"),
      round(p1, 6).as("p1"), round(p2, 6).as("p2"),
      round(p3, 6).as("p3"), round(p4, 6).as("p4"),
      round(bp, 6).as("bp"), round(bleu, 6).as("bleu"))
  }

  /** chrF2 (Popović 2015): character n-gram F-score with β = 2, orders
    * n = 1..6 over whitespace-stripped lowercase text. Per pair, P/R are
    * the arithmetic means of the per-order clipped precisions/recalls
    * (orders the candidate/reference can't fill contribute 0 — stated
    * convention, spelled identically in the oracle), F2 = 5PR/(4P+R).
    * Same co-partitioned counting-join shape as the word metrics; char
    * grams come from substr over an index sequence (never a char-array
    * split — engines disagree on trailing empties).
    */
  def chrF(docs: DataFrame, maxN: Int = 6): DataFrame = {
    def micros(m: Column, t: Column): Column =
      floor(when(t > 0, m.cast("double") / t.cast("double")).otherwise(lit(0.0)) *
        lit(1000000.0) + lit(0.5)).cast("long")
    // the char-overlap kernel computes every order's clipped match in one
    // native pass over the whitespace-stripped pair; the e6 P/R sums add
    // up IN the projection — the whole per-pair statistic is one
    // codegen'd select, and only the final per-source aggregate shuffles
    // (map-side combined to |sources| rows)
    val withM = pairDocs(docs).select(col("source"),
      graft.expressions.OverlapKernels.charOverlap(col("cand"), col("ref")).as("ov"))
    val perPair = withM.select(col("source"),
      (1 to maxN).map { n =>
        micros(col(s"ov.m$n"), greatest(col("ov.nc") - (n - 1), lit(0L)))
      }.reduce(_ + _).as("sp_raw"),
      (1 to maxN).map { n =>
        micros(col(s"ov.m$n"), greatest(col("ov.nr") - (n - 1), lit(0L)))
      }.reduce(_ + _).as("sr_raw"))
      // integer mean over the fixed order count: DIV, never a double cast
      // (Spark long-cast truncates where DuckDB double→BIGINT rounds)
      .select(col("source"),
        expr(s"sp_raw DIV $maxN").as("pm6"), expr(s"sr_raw DIV $maxN").as("rm6"))
      .select(col("source"), col("pm6"), col("rm6"),
        when(col("pm6") + col("rm6") === 0, lit(0L))
          .otherwise(floor(
            lit(5.0) * col("pm6").cast("double") * col("rm6").cast("double") /
              (lit(4.0) * col("pm6").cast("double") + col("rm6").cast("double")) + lit(0.5))
            .cast("long")).as("f_micros"))
    perPair.groupBy(col("source"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("pm6")).as("sp"), sum(col("rm6")).as("sr"), sum(col("f_micros")).as("sf"))
      .select(col("source"), col("n_pairs"),
        round(col("sp").cast("double") / col("n_pairs").cast("double") / lit(1000000.0), 6).as("avg_chrp"),
        round(col("sr").cast("double") / col("n_pairs").cast("double") / lit(1000000.0), 6).as("avg_chrr"),
        round(col("sf").cast("double") / col("n_pairs").cast("double") / lit(1000000.0), 6).as("avg_chrf2"))
  }

  /** ROUGE-1/ROUGE-2 per source: per-pair precision/recall/F1 quantized
    * to e6 micros (exact BIGINT sums), macro-averaged over ALL pairs of
    * the source (pairs with no grams of that order count as zeros).
    */
  def rougeCorpus(docs: DataFrame): DataFrame = {
    val stats = clippedStats(pairDocs(docs), maxN = 2)
    val prec = when(col("tc") > 0, col("m").cast("double") / col("tc").cast("double"))
      .otherwise(lit(0.0))
    val rec = when(col("tr") > 0, col("m").cast("double") / col("tr").cast("double"))
      .otherwise(lit(0.0))
    def micros(c: Column): Column = floor(c * lit(1000000.0) + lit(0.5)).cast("long")
    val perPair = stats.select(
      col("source"), col("n"),
      micros(prec).as("p_micros"), micros(rec).as("r_micros"),
      micros(when(col("m") === 0, lit(0.0))
        .otherwise(lit(2.0) * prec * rec / (prec + rec))).as("f_micros"))
    perPair
      .groupBy(col("source"), col("n"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("p_micros")).as("sp"), sum(col("r_micros")).as("sr"),
        sum(col("f_micros")).as("sf"))
      .select(col("source"), col("n"), col("n_pairs"),
        round(col("sp").cast("double") / col("n_pairs").cast("double") / lit(1000000.0), 6).as("avg_p"),
        round(col("sr").cast("double") / col("n_pairs").cast("double") / lit(1000000.0), 6).as("avg_r"),
        round(col("sf").cast("double") / col("n_pairs").cast("double") / lit(1000000.0), 6).as("avg_f1"))
  }
}
