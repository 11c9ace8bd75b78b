package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stratified (standardization) causal-effect estimators for a binary
  * exposure and binary outcome under a discrete confounder: the naive
  * (unadjusted) risk difference, the ATE by direct standardization over the
  * stratum distribution — algebraically the Horvitz–Thompson IPW estimate
  * under the saturated frequency propensity ê_s = n₁ₛ/nₛ — and the ATT
  * (effect on the treated), which reweights the per-stratum contrasts by
  * the TREATED stratum distribution. Adjustment matters exactly when the
  * exposure is confounded (the naive and adjusted numbers separate);
  * that separation is the point of the oracled query.
  *
  * Conventions (part of the oracled contract): strata violating positivity
  * (n₁ₛ = 0 or n₀ₛ = 0) contribute zero to the effect sums while N and N₁
  * keep counting them — the HT-with-zero convention, stated rather than
  * silently renormalized.
  *
  * Replay discipline: all counts are exact BIGINTs from one
  * map-side-combined groupBy; each stratum's contrast is ONE fixed-spelling
  * double expression — (pos₁/n₁ − pos₀/n₀)·w — e6-quantized per stratum
  * BEFORE the integer sum (the PSI per-term rule); the final divisions by
  * N and N₁ are single identically-spelled double ops rounded half-up
  * (floor(x+0.5) handles the possibly-negative totals symmetrically on
  * both engines — never a bare DIV on a negative numerator).
  *
  * Scale shape: everything after the one groupBy runs on the |strata|-row
  * summary; a 100-TB run shuffles |strata| rows.
  */
object Causal {

  private def e6(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    floor(c * lit(1000000.0d) + lit(0.5d)).cast("long")

  /** One summary row: `(n, n_treated, naive_e6, ate_e6, att_e6)`.
    * `treatCol` and `outcomeCol` must be 0/1 integers, `stratumCol` any
    * grouping key.
    */
  def stratifiedEffects(df: DataFrame, treatCol: String, outcomeCol: String,
      stratumCol: String): DataFrame = {
    val t = col(treatCol).cast("long")
    val y = col(outcomeCol).cast("long")
    val strata = df.groupBy(col(stratumCol).as("s"))
      .agg(
        count(lit(1)).as("n"),
        sum(t).as("n1"),
        sum(t * y).as("pos1"),
        sum((lit(1L) - t) * y).as("pos0"))
      .withColumn("n0", col("n") - col("n1"))
    val contrast = col("pos1").cast("double") / col("n1").cast("double") -
      col("pos0").cast("double") / col("n0").cast("double")
    val ok = col("n1") > 0L && col("n0") > 0L
    val tot = strata.agg(
      sum(col("n")).as("n"),
      sum(col("n1")).as("n_treated"),
      sum(col("pos1")).as("pos1t"),
      sum(col("pos0")).as("pos0t"),
      sum(when(ok, e6(contrast * col("n").cast("double"))).otherwise(lit(0L)))
        .as("ate_num"),
      sum(when(ok, e6(contrast * col("n1").cast("double"))).otherwise(lit(0L)))
        .as("att_num"))
    tot.select(
      col("n"), col("n_treated"),
      (expr("pos1t * 1000000 DIV n_treated") -
        expr("pos0t * 1000000 DIV (n - n_treated)")).as("naive_e6"),
      floor(col("ate_num").cast("double") / col("n").cast("double") + lit(0.5d))
        .cast("long").as("ate_e6"),
      floor(col("att_num").cast("double") / col("n_treated").cast("double") + lit(0.5d))
        .cast("long").as("att_e6"))
  }
}
