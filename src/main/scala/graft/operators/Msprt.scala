package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Always-valid sequential A/B testing — the mixture SPRT (Johari, Pekelis
  * & Walsh 2017/2022, "Peeking at A/B tests" / "Always-valid inference"):
  * the fixed-horizon z-test ([[AbTest]]) is only valid at ONE
  * pre-committed n, but experimenters peek daily; the mSPRT's mixture
  * likelihood ratio Λ_n is a test MARTINGALE, so the running
  * p_n = 1 / max_{m≤n} Λ_m is valid at every look simultaneously —
  * significance, once reached, never un-reaches.
  *
  * Normal-approximation two-proportion form, θ₀ = 0, mixture variance τ²:
  *   log Λ_n = ½·ln(V/(V+τ²)) + diff²·τ² / (2·V·(V+τ²))
  * with diff the arm-conversion difference and V the pooled variance of
  * the difference at look n. exp is never computed — everything stays in
  * log space, and ln is the one libm call the oracle battery already
  * replays (PSI/NMI precedent).
  *
  * Determinism contract: arms are md5-48 % 2 ([[AbTest]]'s assignment);
  * per-look n/x counts are exact windowed BIGINTs over the bounded days
  * table; log Λ is ONE fixed-spelling double chain over those integers,
  * e6-quantized per look BEFORE the integer running max; degenerate looks
  * (an empty arm or boundary pooled rate) contribute log Λ = 0.
  *
  * Scale shape: one (user, day) rollup + one day rollup; every window runs
  * on the |days|-row table (the RobustTrend bounded contract).
  */
object Msprt {

  /** ln(α)·10⁶ for α = 0.05 — spliced into the SQL twin. */
  val LnAlphaE6: Long = math.floor(math.log(0.05d) * 1000000.0d + 0.5d).toLong

  /** One row per day (look): cumulative per-arm trials/conversions, the
    * e6-quantized log mixture-LR, the always-valid ln p, and the decision
    * at α = 0.05. A (user, day) pair is one trial; conversion = purchased
    * that day.
    */
  def sequentialLift(events: DataFrame, tau2: Double = 0.0025d): DataFrame = {
    require(tau2 > 0.0d)
    val ud = events
      .select(col("user_id"),
        expr("(ts_ns DIV 1000) DIV 86400000000").as("day"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("p"))
      .groupBy(col("user_id"), col("day"))
      .agg(max(col("p")).as("conv"))
      .withColumn("arm", HashSplit.md548(col("user_id")) % lit(2L))
    val daily = ud.groupBy(col("day")).agg(
      sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("dn_a"),
      sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("dn_b"),
      sum(when(col("arm") === 0L, col("conv")).otherwise(0L)).as("dx_a"),
      sum(when(col("arm") === 1L, col("conv")).otherwise(0L)).as("dx_b"))
    val w = Window.orderBy(col("day")).rowsBetween(Window.unboundedPreceding, 0)
    val cum = daily.select(col("day"),
      sum(col("dn_a")).over(w).as("n_a"), sum(col("dn_b")).over(w).as("n_b"),
      sum(col("dx_a")).over(w).as("x_a"), sum(col("dx_b")).over(w).as("x_b"))
    val pa = col("x_a").cast("double") / col("n_a").cast("double")
    val pb = col("x_b").cast("double") / col("n_b").cast("double")
    val pool = (col("x_a") + col("x_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    val v = pool * (lit(1.0d) - pool) *
      (lit(1.0d) / col("n_a").cast("double") + lit(1.0d) / col("n_b").cast("double"))
    val degenerate = col("n_a") === 0L || col("n_b") === 0L ||
      col("x_a") + col("x_b") === 0L ||
      col("x_a") + col("x_b") === col("n_a") + col("n_b")
    val t2 = lit(tau2)
    val logLambda = when(degenerate, lit(0.0d)).otherwise(
      lit(0.5d) * log(v / (v + t2)) +
        (pb - pa) * (pb - pa) * t2 / (lit(2.0d) * v * (v + t2)))
    val scored = cum
      .withColumn("log_lambda_e6",
        floor(logLambda * lit(1000000.0d) + lit(0.5d)).cast("long"))
      .withColumn("run_max", max(col("log_lambda_e6")).over(w))
      .select(col("day"), col("n_a"), col("n_b"), col("x_a"), col("x_b"),
        col("log_lambda_e6"),
        (-greatest(col("run_max"), lit(0L))).as("ln_p_e6"))
    scored.withColumn("significant", col("ln_p_e6") <= lit(LnAlphaE6))
  }
}
