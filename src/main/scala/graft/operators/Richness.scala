package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Vocabulary-richness estimation — the abundance-based profile of "how
  * much vocabulary haven't we seen yet?", next to the Heaps GROWTH curves
  * (`q_vocab_growth`): from the per-source word-frequency spectrum alone,
  *
  *   - Chao1 (bias-corrected, Chao 1984/1987):
  *     Ŝ = D + f1·(f1 − 1) / (2·(f2 + 1)) — a lower-bound estimate of the
  *     TRUE vocabulary size from the hapax/doubleton counts (the
  *     species-richness estimator ecology standardized; +1 keeps it
  *     defined when no doubletons exist).
  *   - Good–Turing unseen mass (Good 1953): P(next token is a NEW type)
  *     ≈ f1 / N — the coverage diagnostic that tells a curator whether a
  *     source's vocabulary is saturated (small) or still growing (large).
  *
  * Both are RATIOS OF EXACT BIGINTS — emitted as floor-micros via integer
  * `DIV` (non-negative operands, so Spark's truncation ≡ DuckDB's floor)
  * with zero float operations anywhere; the whole profile hash-replays.
  * Overflow bound: f1²·10⁶ needs f1 < 3·10⁶ hapax types per group —
  * beyond that (a ~10¹² -token source), divide before scaling.
  *
  * Scale shape: one (group, word) count shuffle over the corpus, then the
  * count-of-counts aggregate over the TYPE table (Heaps-law sublinear) —
  * the same two-stage shape every vocabulary profile here pays. No
  * driver state, nothing pairwise.
  *
  * Reference scope: no counterpart; SURVEY §2.12 text-profiling extension
  * (family of [[Zipf]], [[Diversity]], the Heaps growth queries).
  */
object Richness {

  /** Per-group spectrum + estimators: (group, n_tokens, d_types, f1, f2,
    * chao1_e6, gt_unseen_e6).
    */
  def bySource(
      docs: DataFrame,
      groupCol: String = "source",
      textCol: String = "text"
  ): DataFrame = {
    val wc = docs
      .select(col(groupCol), explode(TextFunctions.tokens(col(textCol))).as("word"))
      .groupBy(col(groupCol), col("word"))
      .agg(count(lit(1)).as("cnt"))
    wc.groupBy(col(groupCol))
      .agg(
        sum(col("cnt")).as("n_tokens"),
        count(lit(1)).as("d_types"),
        sum(when(col("cnt") === 1L, 1L).otherwise(0L)).as("f1"),
        sum(when(col("cnt") === 2L, 1L).otherwise(0L)).as("f2"))
      .select(col(groupCol), col("n_tokens"), col("d_types"), col("f1"), col("f2"),
        expr("d_types * 1000000 + f1 * (f1 - 1) * 1000000 DIV (2 * (f2 + 1))")
          .as("chao1_e6"),
        expr("f1 * 1000000 DIV n_tokens").as("gt_unseen_e6"))
  }
}
