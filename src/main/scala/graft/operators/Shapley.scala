package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact Shapley-value channel attribution over touched-channel coalitions
  * (the "simplified Shapley" marketing-attribution estimator, Zhao et al.
  * 2018): each user exposes a SET of channels; the characteristic function
  * `v(S)` is the observed conversion rate of users whose touched set is
  * exactly S — INCLUDING S = ∅: v(∅) is the observed empty-coalition
  * baseline (users whose only events are purchases land in mask 0 with
  * conv = 1), not the game-theoretic 0; only UNOBSERVED coalitions
  * contribute v = 0. The φ values are therefore marginal lifts over the
  * observed no-touch baseline rather than over zero (r19 ADVICE — the
  * oracle mirrors this estimator exactly); each
  * channel's value is the classic weighted marginal sum
  *
  *   φᵢ = Σ_{S ⊆ C∖{i}}  |S|!·(|C|−|S|−1)!/|C|! · [v(S∪{i}) − v(S)]
  *
  * With |C| = 3 channels the 8 coalitions and 12 (channel, S) marginal
  * terms are a LITERAL table — the corpus-scale work is ONE aggregate on
  * the user key to form coalition masks, then one 8-row rate table joined
  * twice against the 12-row literal frame. No collect, no driver math: at
  * 100 TB the cost is the per-user aggregate every funnel already pays.
  *
  * Exactness: rates are `floor(conv·10⁶/n)` micros; marginals are BIGINT
  * differences; the factorial weights are scaled by |C|! = 6 so every
  * coefficient is an exact integer (w·6 ∈ {2, 1, 2} for |S| = 0, 1, 2) —
  * the output `phi6_e6` is 6·φ in rate-micros, a pure BIGINT sum.
  */
object Shapley {

  val Channels: Seq[String] = Seq("view", "click", "signup")

  /** Per-channel 6-scaled Shapley value in rate-micros plus the observed
    * marginal-term count. Output: `channel`, `phi6_e6`, `n_terms`.
    */
  def attribution(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    // coalition mask per user + conversion flag: one user-key aggregate
    val masked = events
      .groupBy(col("user_id"))
      .agg(
        (max(when(col("event_type") === Channels(0), 1L).otherwise(0L))
          + max(when(col("event_type") === Channels(1), 1L).otherwise(0L)) * 2L
          + max(when(col("event_type") === Channels(2), 1L).otherwise(0L)) * 4L)
          .as("mask"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("conv"))
    // ≤ 8 rows — but it feeds the marginal-term join TWICE (v_with /
    // v_without aliases), and Catalyst does not reuse the common subplan:
    // without materialization the per-user aggregate over the whole
    // corpus runs twice. Eager localCheckpoint pins the 8 rows once.
    val rates = masked.groupBy(col("mask"))
      .agg(count(lit(1)).as("n"), sum(col("conv")).as("n_conv"))
      .select(col("mask"),
        floor(col("n_conv").cast("double") * lit(1000000.0) / col("n"))
          .cast("long").as("rate_e6"))
      .localCheckpoint(true)

    // literal (channel, S-without, S-with, 6·weight) marginal-term table:
    // 3 channels × 4 coalitions not containing the channel
    val terms = (for {
      (ch, i) <- Channels.zipWithIndex
      s <- 0 until 8 if (s & (1 << i)) == 0
    } yield {
      val size = Integer.bitCount(s)
      val coef6 = size match { case 0 => 2L; case 1 => 1L; case 2 => 2L }
      (ch, s.toLong, (s | (1 << i)).toLong, coef6)
    }).toDF("channel", "mask_without", "mask_with", "coef6")

    // v(S) for unobserved coalitions is 0 — left joins + coalesce
    val withRates = terms
      .join(broadcast(rates.select(col("mask").as("mask_with"), col("rate_e6").as("v_with"))),
        Seq("mask_with"), "left")
      .join(broadcast(rates.select(col("mask").as("mask_without"), col("rate_e6").as("v_without"))),
        Seq("mask_without"), "left")
    withRates
      .groupBy(col("channel"))
      .agg(
        sum(col("coef6") * (coalesce(col("v_with"), lit(0L))
          - coalesce(col("v_without"), lit(0L)))).as("phi6_e6"),
        sum(when(col("v_with").isNotNull || col("v_without").isNotNull, 1L)
          .otherwise(0L)).as("n_terms"))
  }
}
