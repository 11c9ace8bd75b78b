package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Weight-of-Evidence / Information-Value binning (the classic
  * risk-modeling feature report; Siddiqi 2006): for a binned feature and
  * a binary label, each bin's WoE = ln((pos_i/pos)/(neg_i/neg)) measures
  * how strongly the bin separates the classes, and
  * IV = Σ (pos_i/pos − neg_i/neg)·WoE_i summarizes the feature's
  * predictive power (rule of thumb: < 0.02 useless, > 0.5 suspicious).
  *
  * Numeric discipline: counts are exact BIGINTs; WoE is ONE ln of a ratio
  * of exact-integer ratios, quantized floor-6 in the identical spelling
  * both engines use (the Markov-entropy ln precedent); per-bin IV terms
  * quantize to e6 BIGINTs BEFORE the total (never aggregate doubles —
  * the q_seasonal_decompose lesson). Bins where either class is empty
  * have undefined WoE and are reported with NULL woe and a ZERO IV
  * contribution (the conventional skip), never dropped silently.
  *
  * Scale shape: one grouped count per bin + a 1-row totals broadcast
  * (the q22 pattern); |bins| is a constant, so everything after the
  * first aggregate is metadata-sized.
  */
object WoeBinning {

  /** @param binned (bin, is_pos) rows — one per unit (user, doc, …). */
  def woeTable(binned: DataFrame): DataFrame = {
    val perBin = binned.groupBy(col("bin")).agg(
      sum(when(col("is_pos"), 1L).otherwise(0L)).as("n_pos"),
      sum(when(col("is_pos"), 0L).otherwise(1L)).as("n_neg"))
    val totals = perBin.agg(
      coalesce(sum(col("n_pos")), lit(0L)).as("t_pos"),
      coalesce(sum(col("n_neg")), lit(0L)).as("t_neg"))
    val pr = col("n_pos").cast("double") / col("t_pos").cast("double")
    val nr = col("n_neg").cast("double") / col("t_neg").cast("double")
    val defined = col("n_pos") > 0L && col("n_neg") > 0L &&
      col("t_pos") > 0L && col("t_neg") > 0L
    def floor6(c: Column): Column =
      floor(c * lit(1000000.0d) + lit(0.5d)) / lit(1000000.0d)
    val woe = log(pr / nr)
    perBin.crossJoin(broadcast(totals))
      .select(
        col("bin"), col("n_pos"), col("n_neg"),
        when(defined, floor6(woe)).as("woe"),
        when(defined, floor(((pr - nr) * woe) * lit(1000000.0d) + lit(0.5d)).cast("long"))
          .otherwise(0L).as("iv_e6"))
  }

  /** One-row feature summary: bin count, defined-bin count, total IV. */
  def informationValue(binned: DataFrame): DataFrame =
    woeTable(binned).agg(
      count(lit(1)).as("n_bins"),
      sum(when(col("woe").isNotNull, 1L).otherwise(0L)).as("n_defined_bins"),
      coalesce(sum(col("iv_e6")), lit(0L)).as("iv_e6"))
}
