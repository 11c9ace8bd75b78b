package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Pairwise Jensen–Shannon divergence between per-source unigram
  * distributions — the symmetric, bounded (≤ ln 2) drift measure a
  * mixture curator actually wants between corpus slices (KL is
  * asymmetric and infinite on disjoint support; JSD is neither):
  *
  *   JSD(P,Q) = ½ Σ_w [ p ln(p/m) + q ln(q/m) ],  m = (p+q)/2
  *
  * Distributions are restricted to the global top-`vocabTop` words
  * (corpus count desc, word asc — deterministic) and renormalized within
  * that support, which bounds the pair computation at k·V rows however
  * large the corpus: the word-count aggregate is the only corpus-scale
  * stage, and it is the same shuffle every vocabulary profile pays.
  *
  * Exactness: p, q, m are IEEE divisions of exact BIGINT counts —
  * bit-identical in any engine — and each per-word summand is quantized
  * `floor((p·ln(p/m) + q·ln(q/m))·½·10⁶ + 0.5)` BEFORE the pair sum (the
  * Markov-entropy ln precedent: identical spelling, floor-6, integer
  * aggregation), so `jsd_e6` is a BIGINT sum with no double aggregate.
  * Zero counts contribute zero (0·ln 0 := 0) and m > 0 is guaranteed on
  * any row where a term is evaluated.
  */
object Divergence {

  /** Pairwise `source_a < source_b` JSD in nat-micros over the top-V
    * unigram support. Output: `source_a`, `source_b`, `jsd_e6`.
    */
  def jsdBySource(
      docs: DataFrame,
      groupCol: String = "source",
      textCol: String = "text",
      vocabTop: Int = 200
  ): DataFrame = {
    val words = docs.select(col(groupCol).as("grp"),
        explode(TextFunctions.tokens(col(textCol))).as("word"))
    // deterministic bounded support: global top-V words
    val top = words.groupBy(col("word")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word")).limit(vocabTop)
      .select(col("word"))
    val counts = words.join(broadcast(top), Seq("word"))
      .groupBy(col("grp"), col("word")).agg(count(lit(1)).as("cnt"))
    // dense k×V matrix (bounded): every (source, support word) cell, so
    // one-sided words still contribute their q·ln(q/m) term
    val dense = docs.select(col(groupCol).as("grp")).distinct()
      .crossJoin(broadcast(top))
      .join(counts, Seq("grp", "word"), "left")
      .select(col("grp"), col("word"), coalesce(col("cnt"), lit(0L)).as("cnt"))
    val tot = dense.groupBy(col("grp")).agg(sum(col("cnt")).as("tot"))
    // a group with ZERO top-vocab tokens (tot = 0) is a valid input — its
    // distribution is all-zero mass, p := 0 for every word (the 0/0 would
    // otherwise be NaN and ANSI-throw at the final cast)
    val withP = dense.join(broadcast(tot), Seq("grp"))
      .select(col("grp"), col("word"),
        when(col("tot") > 0,
          col("cnt").cast("double") / col("tot").cast("double"))
          .otherwise(lit(0.0)).as("p"))

    val a = withP.select(col("grp").as("source_a"), col("word"), col("p").as("pa"))
    val b = withP.select(col("grp").as("source_b"), col("word"), col("p").as("pb"))
    def half(p: Column, m: Column): Column =
      when(p > 0, p * log(p / m)).otherwise(lit(0.0))
    a.join(b, Seq("word"))
      .filter(col("source_a") < col("source_b"))
      .select(col("source_a"), col("source_b"),
        floor((half(col("pa"), (col("pa") + col("pb")) / 2)
             + half(col("pb"), (col("pa") + col("pb")) / 2))
          * lit(500000.0) + lit(0.5)).cast("long").as("term_e6"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(sum(col("term_e6")).as("jsd_e6"))
  }
}
