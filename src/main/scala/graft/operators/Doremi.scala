package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DoReMi-style domain reweighting (Xie et al. 2023, "DoReMi: Optimizing
  * Data Mixtures Speeds Up Language Model Pretraining") — domain weights
  * boosted by per-domain EXCESS LOSS, the one major public curation
  * technique the mixture family still lacked: up-weight the domains the
  * proxy model finds hardest relative to the reference, smooth toward
  * uniform so nothing starves.
  *
  * Deterministic replay twin, stated honestly: the paper's excess loss is
  * proxy-vs-reference model loss under Group-DRO retraining; this replay
  * uses a fixed deterministic loss table (per-doc losses in integer
  * micros, e.g. the [[LmScore]] bigram-LM scores — lossless e6 from a
  * round-6 series) and the CORPUS mean as the reference, so the
  * multiplicative update is ONE exact step rather than an (unreplayable)
  * training trajectory:
  *
  *   excess_s = max(0, loss_s − loss_corpus)            (nats, ≥ 0)
  *   w_s ∝ sqrt(n_s / n) · pexp(excess_s)               (τ = ½ baseline ·
  *                                                       Hedge boost)
  *   α_s = (1 − ε) · w_s / Σw + ε / K                   (uniform smoothing)
  *
  * Engine-exactness: domain loss means are single divisions of exact
  * BIGINT micro sums; excess is quantized to integer micros BEFORE the
  * exp surrogate, so [[PseudoExp.chain]] (pure IEEE ·/+, the GmmReplay
  * kernel) sees identical inputs; the τ=½ temperature baseline is
  * `sqrt` — correctly rounded by IEEE-754, unlike `pow`; boosted weights
  * quantize to e6 BIGINTs before the (order-free, exact) normalization
  * sum; the final α is one fixed-spelling float expression, floor-6.
  *
  * Scale shape: one equi-join (docs → losses) + one source-keyed
  * aggregate; everything after runs on the |sources|-row table
  * (broadcast 1-row totals, never a float aggregate).
  */
object Doremi {

  /** (source, n_docs, sum_loss_e6, excess_e6, w_e6, weight) per domain.
    * `docLossE6`: (doc_id, loss_e6) — per-doc loss in integer micro-nats
    * (HIGHER = harder; pass negated log-probs). Docs absent from the loss
    * table (e.g. too short to score) are excluded, both engines alike.
    */
  def weights(
      docs: DataFrame,
      docLossE6: DataFrame,
      sourceCol: String = "source",
      idCol: String = "doc_id"
  ): DataFrame = {
    val ds = docs.select(col(idCol), col(sourceCol).as("source"))
      .join(docLossE6, Seq(idCol))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("loss_e6")).as("sum_loss_e6"))
    val tot = ds.agg(
      sum(col("n_docs")).as("tn"), sum(col("sum_loss_e6")).as("ts"),
      count(lit(1)).as("k"))
    val ex = ds.crossJoin(broadcast(tot))
      .withColumn("excess_e6",
        floor(greatest(lit(0.0d),
          col("sum_loss_e6").cast("double") / col("n_docs").cast("double")
            - col("ts").cast("double") / col("tn").cast("double"))
          + lit(0.5d)).cast("long"))
      .withColumn("_x", col("excess_e6").cast("double") / lit(1000000.0d))
    val pe = PseudoExp.chain(ex, "_x", "_pexp")
    val w = pe.withColumn("w_e6",
      floor(sqrt(col("n_docs").cast("double") / col("tn").cast("double"))
        * col("_pexp") * lit(1000000.0d) + lit(0.5d)).cast("long"))
    val tw = w.agg(sum(col("w_e6")).as("tot_w"))
    w.crossJoin(broadcast(tw))
      .select(col("source"), col("n_docs"), col("sum_loss_e6"),
        col("excess_e6"), col("w_e6"),
        (floor((lit(0.99d) * col("w_e6").cast("double") / col("tot_w").cast("double")
          + lit(0.01d) / col("k").cast("double")) * lit(1000000.0d) + lit(0.5d))
          / lit(1000000.0d)).as("weight"))
  }
}
