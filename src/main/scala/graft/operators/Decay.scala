package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Half-life-quantized exponential decay counters — the "trending now"
  * aggregate: every event contributes weight `2^(−Δt/h)` toward its key,
  * so recent activity dominates and old activity fades at a controlled
  * rate. The continuous weight is QUANTIZED TO WHOLE HALF-LIVES
  * (`k = Δt div h`, weight = 10⁶ >> k): every term is an exact integer in
  * any engine (no `exp`/`pow` — cross-engine transcendentals on arbitrary
  * doubles are the one thing the oracle discipline avoids), while keeping
  * the decay semantics (each elapsed half-life halves the weight; ≥ 20
  * half-lives is zero).
  *
  * The reference time is the corpus max event time (1-row aggregate,
  * broadcast) so the score is a pure function of the data. Scale shape:
  * one zero-shuffle weight projection + one aggregate on the key — the
  * same cost as a plain count.
  */
object Decay {

  /** Per-key decayed scores. Input needs `ts_us`; output: key column,
    * `n_events`, `latest_us`, `score_e6` (Σ 10⁶·2^(−k), BIGINT).
    */
  def trendingScores(
      ev: DataFrame,
      keyCol: String,
      halfLifeUs: Long
  ): DataFrame = {
    require(halfLifeUs > 0, "half-life must be positive")
    val ref = ev.agg(max(col("ts_us")).as("_ref"))
    val k = floor((col("_ref") - col("ts_us")).cast("double") / halfLifeUs)
      .cast("long")
    ev.crossJoin(broadcast(ref))
      .select(col(keyCol), col("ts_us"),
        when(k >= 20L, 0L)
          .otherwise(floor(lit(1000000.0)
              / call_function("shiftleft", lit(1L), k.cast("int")))
            .cast("long")).as("_w"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        max(col("ts_us")).as("latest_us"),
        sum(col("_w")).as("score_e6"))
  }
}
