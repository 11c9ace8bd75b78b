package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic classifier evaluation battery over an integer-micro score
  * column — threshold-sweep precision/recall/F1, per-confidence-bucket
  * calibration (the ECE decomposition), and cumulative gains by score
  * decile. MLlib's evaluators (M3/M4) answer the same questions for
  * trained models but are engine-specific; this battery is exact integer
  * arithmetic end to end, so the evaluation itself hash-oracles — the
  * difference between "the metric looked right once" and "the metric is
  * pinned cross-engine".
  *
  * Scale shape: the PRF sweep is one explode over |thresholds| (a
  * constant) and one aggregate; calibration is one groupBy on the
  * (few-valued) confidence column; gains ranks with the distributed
  * [[PrefixSum]] rank (never a single-partition window) and the only
  * global window runs over the 10 decile rows.
  */
object ClassifierEval {

  /** (thr_micros, tp, fp, fn, tn, precision_micros, recall_micros,
    * f1_micros) per threshold; positive ⇔ score ≥ threshold. F1 spelled
    * 2tp/(2tp+fp+fn) — one exact floor division, not a composed ratio.
    */
  def prfSweep(
      scored: DataFrame,
      scoreCol: String,
      labelCol: String,
      thresholds: Seq[Long]
  ): DataFrame = {
    require(thresholds.nonEmpty, "need at least one threshold")
    val kvs = thresholds.map { t =>
      struct(lit(t).as("thr"), (col(scoreCol) >= t).as("pred"))
    }
    scored.select(col(labelCol).as("y"), explode(array(kvs: _*)).as("kv"))
      .groupBy(col("kv.thr").as("thr_micros"))
      .agg(
        sum(when(col("kv.pred") && col("y") === 1, 1L).otherwise(0L)).as("tp"),
        sum(when(col("kv.pred") && col("y") === 0, 1L).otherwise(0L)).as("fp"),
        sum(when(!col("kv.pred") && col("y") === 1, 1L).otherwise(0L)).as("fn"),
        sum(when(!col("kv.pred") && col("y") === 0, 1L).otherwise(0L)).as("tn"))
      .select(col("thr_micros"), col("tp"), col("fp"), col("fn"), col("tn"),
        when(col("tp") + col("fp") === 0, 0L)
          .otherwise(expr("tp * 1000000 DIV (tp + fp)")).as("precision_micros"),
        when(col("tp") + col("fn") === 0, 0L)
          .otherwise(expr("tp * 1000000 DIV (tp + fn)")).as("recall_micros"),
        when(col("tp") * 2 + col("fp") + col("fn") === 0, 0L)
          .otherwise(expr("2 * tp * 1000000 DIV (2 * tp + fp + fn)")).as("f1_micros"))
  }

  /** Per-confidence-bucket calibration: (conf_micros, n, n_pos,
    * acc_micros, gap_micros, ece_contrib_micros). ECE = Σ contributions;
    * the per-bucket decomposition is the diagnosable artifact.
    */
  def calibration(scored: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val b = scored.groupBy(col(scoreCol).as("conf_micros"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(labelCol) === 1, 1L).otherwise(0L)).as("n_pos"))
    val total = b.agg(sum(col("n")).as("n_total"))
    b.crossJoin(broadcast(total))
      .withColumn("acc_micros", expr("n_pos * 1000000 DIV n"))
      .withColumn("gap_micros", abs(col("acc_micros") - col("conf_micros")))
      .withColumn("ece_contrib_micros", expr("n * gap_micros DIV n_total"))
      .select(col("conf_micros"), col("n"), col("n_pos"), col("acc_micros"),
        col("gap_micros"), col("ece_contrib_micros"))
  }

  /** Exact tie-aware AUC (Mann–Whitney): ranks live in DOUBLED units so
    * tied groups get exact average ranks with no fraction —
    * 2S = Σ_buckets np_b·(2·cum_before_b + n_b + 1), then
    * AUC = (2S − npos(npos+1)) / (2·npos·nneg), one floor division at
    * micros. Output: (npos, nneg, auc_micros); degenerate single-class
    * input → 0 by convention. The rank window runs over score BUCKETS
    * (distinct score values), not rows — bounded for laddered/quantized
    * scores.
    */
  def aucExact(scored: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val b = scored.groupBy(col(scoreCol).as("s"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(labelCol) === 1, 1L).otherwise(0L)).as("np"))
    val w = Window.orderBy(col("s")).rowsBetween(Window.unboundedPreceding, -1)
    b.withColumn("cum_before", coalesce(sum(col("n")).over(w), lit(0L)))
      .agg(
        sum(expr("np * (2 * cum_before + n + 1)")).as("s2"),
        sum(col("np")).as("npos"),
        sum(col("n") - col("np")).as("nneg"))
      .select(col("npos"), col("nneg"),
        when(col("npos") === 0 || col("nneg") === 0, 0L)
          .otherwise(
            expr("(s2 - npos * (npos + 1)) * 1000000 DIV (2 * npos * nneg)"))
          .as("auc_micros"))
  }

  /** Cumulative gains by score decile: rank (score DESC, id ASC) with the
    * distributed rank, decile = (rank−1)·10 DIV n. Output (decile, n,
    * n_pos, cum_pos, gain_micros) — gain = cum_pos/total_pos.
    */
  def gainsByDecile(
      scored: DataFrame,
      scoreCol: String,
      labelCol: String,
      idCol: String
  ): DataFrame = {
    val ranked = PrefixSum.runningTotal(
      scored.withColumn("_neg", -col(scoreCol)).withColumn("_one", lit(1L)),
      Seq("_neg", idCol), "_one", "_rk")
    val total = scored.agg(count(lit(1)).as("n_total"),
      sum(when(col(labelCol) === 1, 1L).otherwise(0L)).as("pos_total"))
    val dec = ranked.crossJoin(broadcast(total))
      .withColumn("decile", expr("(_rk - 1) * 10 DIV n_total"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(labelCol) === 1, 1L).otherwise(0L)).as("n_pos"),
        first(col("pos_total")).as("pos_total"))
    // the only unpartitioned window runs over the ≤ 10 decile rows
    val w = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dec.withColumn("cum_pos", sum(col("n_pos")).over(w))
      .withColumn("gain_micros", expr("cum_pos * 1000000 DIV greatest(pos_total, 1)"))
      .select(col("decile"), col("n"), col("n_pos"), col("cum_pos"),
        col("gain_micros"))
  }

  /** Chance-corrected agreement between the thresholded score and the
    * label (1 row): Cohen's κ and Matthews correlation. Both reduce to
    * EXACT integer contingency arithmetic before a single replayed
    * division:
    *   κ = (n·(tp+tn) − P) / (n² − P),
    *       P = (tp+fp)(tp+fn) + (fn+tn)(fp+tn)  — exact BIGINTs;
    *   MCC = (tp·tn − fp·fn) / √((tp+fp)(tp+fn)(tn+fp)(tn+fn)) — the
    *       4-factor product exceeds 2⁵³ so it multiplies in DOUBLE with a
    *       fixed spelling (identical IEEE ops cross-engine).
    * Degenerate margins (one-class predictions or labels) report 0, the
    * scikit-learn convention. One aggregation pass, zero shuffle beyond it.
    */
  def agreement(
      scored: DataFrame,
      scoreCol: String,
      labelCol: String,
      thrMicros: Long
  ): DataFrame = {
    val m = scored.agg(
      count(lit(1)).as("n"),
      sum(when(col(scoreCol) >= thrMicros && col(labelCol) === 1, 1L).otherwise(0L)).as("tp"),
      sum(when(col(scoreCol) >= thrMicros && col(labelCol) === 0, 1L).otherwise(0L)).as("fp"),
      sum(when(col(scoreCol) < thrMicros && col(labelCol) === 1, 1L).otherwise(0L)).as("fn"),
      sum(when(col(scoreCol) < thrMicros && col(labelCol) === 0, 1L).otherwise(0L)).as("tn"))
    m.select(col("n"), col("tp"), col("fp"), col("fn"), col("tn"),
      expr("""CASE WHEN n * n = (tp+fp)*(tp+fn) + (fn+tn)*(fp+tn) THEN CAST(0 AS BIGINT)
             |ELSE CAST(floor(
             |  CAST(n * (tp+tn) - ((tp+fp)*(tp+fn) + (fn+tn)*(fp+tn)) AS DOUBLE)
             |  / CAST(n * n - ((tp+fp)*(tp+fn) + (fn+tn)*(fp+tn)) AS DOUBLE)
             |  * 1000000.0 + 0.5) AS BIGINT) END""".stripMargin).as("kappa_micros"),
      expr("""CASE WHEN (tp+fp) = 0 OR (tp+fn) = 0 OR (tn+fp) = 0 OR (tn+fn) = 0
             |THEN CAST(0 AS BIGINT)
             |ELSE CAST(floor(
             |  CAST(tp*tn - fp*fn AS DOUBLE)
             |  / sqrt(CAST(tp+fp AS DOUBLE) * CAST(tp+fn AS DOUBLE)
             |         * CAST(tn+fp AS DOUBLE) * CAST(tn+fn AS DOUBLE))
             |  * 1000000.0 + 0.5) AS BIGINT) END""".stripMargin).as("mcc_micros"))
  }
}
