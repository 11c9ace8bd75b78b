package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** Percentile bootstrap CI for the stratified ATE — the uncertainty the
    * point estimate in [[stratifiedEffects]] ships without. Composes the
    * Poisson-replicate machinery of [[Bootstrap]] (per-(row, replicate)
    * Poisson(1) weights from the portable md5-48 uniform of `id:b` — no
    * coordinated resampling, the only bootstrap that works at 100 TB)
    * through the SAME per-stratum algebra: within each replicate every
    * count becomes its w-weighted sum (n→Σw, n₁→Σw·t, pos₁→Σw·t·y,
    * pos₀→Σw·(1−t)·y), strata violating positivity IN THAT REPLICATE
    * contribute zero by the identical HT-with-zero convention, each
    * stratum contrast is e6-quantized before the exact integer sum, and
    * the replicate ATE is one floor(x+0.5) division. CI bounds are exact
    * order statistics over the B replicate ATEs (`row_number` by
    * (ate, b) — total order, engine-identical).
    *
    * One row `(n, n_treated, ate_e6, b_reps, lo_e6, hi_e6)`: the exact
    * point estimate from [[stratifiedEffects]] plus the percentile CI.
    * A replicate with zero total weight (probability ~e⁻ⁿ) is excluded on
    * both engines alike.
    *
    * Scale shape: the replicate explode is CPU-only blow-up — the
    * (b, stratum) groupBy map-side-combines to ≤ B·|strata| partials per
    * partition, the per-replicate rollup and the rank window run over
    * B-row tables. Nothing driver-side, nothing corpus-sized past the
    * first aggregate.
    */
  def stratifiedAteBootstrap(
      df: DataFrame,
      treatCol: String,
      outcomeCol: String,
      stratumCol: String,
      idCol: String,
      b: Int = 100,
      loPct: Double = 0.025d,
      hiPct: Double = 0.975d): DataFrame = {
    require(b >= 10 && b <= 10000, "b in 10..10000")
    val loRank = math.max(1, math.floor(b * loPct).toInt)
    val hiRank = math.min(b, math.ceil(b * hiPct).toInt)
    val t = col(treatCol).cast("long")
    val y = col(outcomeCol).cast("long")
    val base = df.select(col(idCol).as("_id"), t.as("_t"), y.as("_y"),
      col(stratumCol).as("_s"))
    val point = stratifiedEffects(
      base.withColumnRenamed("_t", "t").withColumnRenamed("_y", "y")
        .withColumnRenamed("_s", "s"), "t", "y", "s")
      .select(col("n"), col("n_treated"), col("ate_e6"))
    val reps = base
      .select(col("_t"), col("_y"), col("_s"),
        posexplode(graft.expressions.PoissonBoot.weights(col("_id"), b)).as(Seq("b", "w")))
      .groupBy(col("b"), col("_s"))
      .agg(
        sum(col("w")).as("nw"),
        sum(col("w") * col("_t")).as("n1w"),
        sum(col("w") * col("_t") * col("_y")).as("pos1w"),
        sum(col("w") * (lit(1L) - col("_t")) * col("_y")).as("pos0w"))
      .withColumn("n0w", col("nw") - col("n1w"))
    val contrast = col("pos1w").cast("double") / col("n1w").cast("double") -
      col("pos0w").cast("double") / col("n0w").cast("double")
    val ok = col("n1w") > 0L && col("n0w") > 0L
    val perRep = reps.groupBy(col("b"))
      .agg(
        sum(col("nw")).as("tn"),
        sum(when(ok, e6(contrast * col("nw").cast("double"))).otherwise(lit(0L)))
          .as("ate_num"))
      .filter(col("tn") > 0L)
      .select(col("b"),
        floor(col("ate_num").cast("double") / col("tn").cast("double") + lit(0.5d))
          .cast("long").as("m"))
    // bounded: the window orders the B-row replicate table, never the corpus
    val ranked = perRep.withColumn("rn",
      row_number().over(Window.orderBy(col("m"), col("b"))))
    val lo = ranked.filter(col("rn") === loRank).select(col("m").as("lo_e6"))
    val hi = ranked.filter(col("rn") === hiRank).select(col("m").as("hi_e6"))
    point
      .crossJoin(broadcast(lo))
      .crossJoin(broadcast(hi))
      .select(col("n"), col("n_treated"), col("ate_e6"), lit(b).as("b_reps"),
        col("lo_e6"), col("hi_e6"))
  }
}
