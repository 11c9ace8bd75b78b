package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Static data-mixture materialization: downsample each source so the kept
  * corpus matches target mixture weights as closely as availability allows
  * (the materialization step behind mixture-tuning work à la DoReMi /
  * the Pile's per-source weights — the weights themselves come from
  * elsewhere; this operator realizes them deterministically).
  *
  * Given relative target weights w_s, the largest corpus honoring them
  * keeps `floor(w_s · scale)` docs of source s, where
  * `scale = min_s(n_s / w_s)` — the binding source is kept whole, every
  * other source is cut down proportionally. Selection within a source is
  * the [[GroupCap]] md5-order rank: a pure function of the data, so the
  * materialized mixture is identical across runs, engines, and
  * partitionings (true RNG would rebuild a different corpus every time).
  *
  * Scale shape: source counts and quotas are an aggregate over |sources|
  * rows broadcast back; selection is ONE shuffle on the source key + a
  * bounded per-group rank (hot sources: pre-cap via bucket limits, as
  * GroupCap documents).
  */
object Mixture {

  /** Keep a deterministic subset realizing `weights` (relative, > 0;
    * sources absent from `weights` are dropped). Adds `samp_rank` (md5-order
    * rank within source) and `keep_n` (the source's quota).
    *
    * Every weighted source must actually have rows: a weight over an empty
    * source would otherwise be silently dropped by the counts join and the
    * realized mixture would deviate arbitrarily from the request (the only
    * strict reading — scale by the empty source's n/w = 0 — keeps nothing),
    * so `requireAllPresent` (default) fails fast instead.
    */
  def rebalance(
      docs: DataFrame,
      sourceCol: String,
      idCol: String,
      weights: Map[String, Double],
      requireAllPresent: Boolean = true
  ): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0), "weights must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val wdf = weights.toSeq.toDF(sourceCol, "_w")

    val counts = docs.groupBy(col(sourceCol)).agg(count(lit(1)).as("_n0"))
    // scale = min over sources of n_s / w_s — an aggregate over |sources| rows.
    // right_outer from the weight table so a weighted-but-empty source is
    // SEEN (null _n0): raise_error inside the same tiny quota job when
    // requireAllPresent, else dropped exactly as the old inner join did.
    val guard =
      if (requireAllPresent)
        when(col("_n0").isNull, raise_error(concat(
          lit("Mixture.rebalance: weighted source has zero rows: "), col(sourceCol))))
          .otherwise(col("_n0"))
      else col("_n0")
    val quotas = counts
      .join(wdf, Seq(sourceCol), "right_outer")
      .withColumn("_n", guard)
      .filter(col("_n").isNotNull)
      .withColumn("_scale", min(col("_n") / col("_w")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .select(col(sourceCol), floor(col("_w") * col("_scale")).cast("long").as("keep_n"))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol))
      .orderBy(GroupCap.sampleKey(col(idCol)), col(idCol))
    docs
      .join(broadcast(quotas), sourceCol)
      .withColumn("samp_rank", row_number().over(w).cast("long"))
      .filter(col("samp_rank") <= col("keep_n"))
  }

  /** Temperature-scaled source weights — the multilingual/multi-source
    * sampling trick (public: XLM-R, mBERT): w_s = (n_s / Σn)^α, with
    * α ∈ (0, 1] flattening the natural distribution (α = 1 keeps it,
    * α → 0 approaches uniform), so low-resource sources are up-weighted
    * without hand-tuning per-source numbers. Feed the result straight into
    * [[rebalance]] / [[rebalanceTokens]].
    *
    * Driver-side probe over the |sources|-row count aggregate (bounded by
    * the source vocabulary, not data volume). Weights are rounded to 6
    * decimals so an external engine reproduces the downstream quota
    * arithmetic exactly (q_mixture_temperature's DuckDB oracle).
    */
  def temperatureWeights(
      docs: DataFrame,
      sourceCol: String,
      alpha: Double
  ): Map[String, Double] = {
    require(alpha > 0 && alpha <= 1, "alpha in (0, 1]")
    val counts = docs.groupBy(col(sourceCol)).agg(count(lit(1)).as("_n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum.toDouble
    counts.map { case (s, n) =>
      s -> BigDecimal(math.pow(n / total, alpha))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
  }

  /** Token-budget variant — mixtures are usually specified in TOKENS, not
    * documents: per source keep the md5-order prefix of documents whose
    * running token total stays within `floor(w_s · min_t(T_t / w_t))`
    * (T_s = source token total). A document is kept iff it fits the
    * remaining budget entirely, so kept totals are ≤ budget and
    * deterministic. Adds `tok_cum` (inclusive running total) and
    * `budget_n` (the source's token budget).
    */
  def rebalanceTokens(
      docs: DataFrame,
      sourceCol: String,
      idCol: String,
      tokenCol: String,
      weights: Map[String, Double]
  ): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0), "weights must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val wdf = weights.toSeq.toDF(sourceCol, "_w")

    val totals = docs.groupBy(col(sourceCol)).agg(sum(col(tokenCol)).as("_t"))
    val budgets = totals
      .join(wdf, sourceCol)
      .withColumn("_scale", min(col("_t") / col("_w")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .select(col(sourceCol), floor(col("_w") * col("_scale")).cast("long").as("budget_n"))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol))
      .orderBy(GroupCap.sampleKey(col(idCol)), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    docs
      .join(broadcast(budgets), sourceCol)
      .withColumn("tok_cum", sum(col(tokenCol)).over(w).cast("long"))
      .filter(col("tok_cum") <= col("budget_n"))
  }
}
