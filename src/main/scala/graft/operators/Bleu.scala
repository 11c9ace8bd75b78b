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
  * Scale shape: the only wide stage is the clipped-match count — gram
  * occurrences keyed by (pair, n, gram), counted, and the candidate/
  * reference sides joined ON THE SAME KEY, so Catalyst plans one exchange
  * per side and a co-partitioned sort-merge join (no re-shuffle between
  * the count and the join). Total/candidate gram counts per pair come
  * straight from array lengths — a zero-shuffle projection, never a
  * second count over the exploded rows. Per-pair doubles are quantized to
  * e6 BIGINTs before the per-source average so every cross-partition sum
  * is exact integer arithmetic (order-independent, engine-portable).
  */
object Bleu {

  val MaxN = 4

  /** Adjacent-doc candidate/reference pairing: even doc_id = candidate,
    * doc_id + 1 = reference. Inner join — an even doc with no successor
    * simply contributes no pair (same semantics in the SQL oracle).
    */
  def pairDocs(docs: DataFrame): DataFrame = {
    val a = docs.select(col("doc_id"), col("source"), col("text")).as("a")
    val b = docs.select(col("doc_id"), col("text")).as("b")
    a.join(b, col("a.doc_id") + lit(1) === col("b.doc_id"))
      .where(col("a.doc_id") % 2 === 0)
      .select(
        col("a.doc_id").as("pair_id"),
        col("a.source").as("source"),
        Repetition.words(col("a.text")).as("cand"),
        Repetition.words(col("b.text")).as("ref"))
  }

  private val emptyStrings: Column = typedLit(Seq.empty[String])

  /** All n-grams for n = 1..maxN as "n|gram" tagged strings in one array —
    * a single flatten so each side explodes exactly once. The tag keeps
    * the (n, gram) grouping key a flat string; n is recovered with a
    * 1-char substring (maxN ≤ 9).
    */
  def taggedGrams(toks: Column, maxN: Int = MaxN): Column =
    flatten(array((1 to maxN).map { n =>
      val nG = size(toks) - (n - 1)
      // sequence(1, 0) would DESCEND — guard the short-doc case explicitly
      when(nG >= 1,
        transform(sequence(lit(1), nG), j =>
          concat(lit(s"$n|"), array_join(slice(toks, j, lit(n)), " "))))
        .otherwise(emptyStrings)
    }: _*))

  /** Per-(pair, n) clipped-match and total gram counts: `m` = Σ_gram
    * min(count_cand, count_ref), `tc`/`tr` = total candidate/reference
    * n-gram occurrences (from array lengths — no second aggregation).
    */
  def clippedStats(pairs: DataFrame, maxN: Int = MaxN): DataFrame = {
    def counts(side: String): DataFrame =
      pairs
        .select(col("pair_id"), explode(taggedGrams(col(side), maxN)).as("tg"))
        .groupBy(col("pair_id"), col("tg"))
        .agg(count(lit(1)).as(s"c_$side"))
    val matched = counts("cand")
      .join(counts("ref"), Seq("pair_id", "tg"))
      .groupBy(col("pair_id"), substring(col("tg"), 1, 1).cast("int").as("n"))
      .agg(sum(least(col("c_cand"), col("c_ref"))).as("m"))
    val base = pairs.select(
      col("pair_id"), col("source"),
      explode(typedLit((1 to maxN).toList)).as("n"),
      col("cand"), col("ref"))
      .select(
        col("pair_id"), col("source"), col("n"),
        greatest(size(col("cand")) - col("n") + 1, lit(0)).cast("long").as("tc"),
        greatest(size(col("ref")) - col("n") + 1, lit(0)).cast("long").as("tr"))
    base
      .join(matched, Seq("pair_id", "n"), "left")
      .select(col("pair_id"), col("source"), col("n"),
        coalesce(col("m"), lit(0L)).as("m"), col("tc"), col("tr"))
  }

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
    // tokens are whitespace-free by construction, so the whitespace-
    // stripped chrF input is just their concatenation
    val pairs = pairDocs(docs)
      .select(col("pair_id"), col("source"),
        array_join(col("cand"), "").as("cand"),
        array_join(col("ref"), "").as("ref"))
    def charGrams(s: Column): Column =
      flatten(array((1 to maxN).map { n =>
        val nG = length(s) - (n - 1)
        when(nG >= 1,
          transform(sequence(lit(1), nG), j => concat(lit(s"$n|"), s.substr(j, lit(n)))))
          .otherwise(emptyStrings)
      }: _*))
    def counts(side: String): DataFrame =
      pairs.select(col("pair_id"), explode(charGrams(col(side))).as("tg"))
        .groupBy(col("pair_id"), col("tg"))
        .agg(count(lit(1)).as(s"c_$side"))
    val matched = counts("cand")
      .join(counts("ref"), Seq("pair_id", "tg"))
      .groupBy(col("pair_id"), substring(col("tg"), 1, 1).cast("int").as("n"))
      .agg(sum(least(col("c_cand"), col("c_ref"))).as("m"))
    val base = pairs.select(col("pair_id"), col("source"),
      explode(typedLit((1 to maxN).toList)).as("n"), col("cand"), col("ref"))
      .select(col("pair_id"), col("source"), col("n"),
        greatest(length(col("cand")) - col("n") + 1, lit(0)).cast("long").as("tc"),
        greatest(length(col("ref")) - col("n") + 1, lit(0)).cast("long").as("tr"))
    val pm = base.join(matched, Seq("pair_id", "n"), "left")
      .select(col("pair_id"), col("source"), col("n"),
        coalesce(col("m"), lit(0L)).as("m"), col("tc"), col("tr"))
    val pn = when(col("tc") > 0, col("m").cast("double") / col("tc").cast("double")).otherwise(lit(0.0))
    val rn = when(col("tr") > 0, col("m").cast("double") / col("tr").cast("double")).otherwise(lit(0.0))
    // exact e6 per (pair, order), then integer mean over the fixed order
    // count — the per-pair P/R are (Σ micros) / maxN, order-independent
    val perOrder = pm.select(col("pair_id"), col("source"),
      floor(pn * lit(1000000.0) + lit(0.5)).cast("long").as("p_micros"),
      floor(rn * lit(1000000.0) + lit(0.5)).cast("long").as("r_micros"))
    val perPair = perOrder.groupBy(col("pair_id"), col("source"))
      .agg(sum(col("p_micros")).as("sp_raw"), sum(col("r_micros")).as("sr_raw"))
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
