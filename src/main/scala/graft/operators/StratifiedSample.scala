package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Neyman-allocation stratified sampling — the survey-statistics optimal
  * split of a fixed sampling budget: stratum s receives quota
  * n_s = ⌊N · (N_s σ_s) / Σ_t (N_t σ_t)⌋ (capped at the stratum size), so
  * high-variance strata get proportionally more of the budget than
  * count-proportional allocation would give. Membership within a stratum
  * is the md5-order prefix (GroupCap's draw) — fully deterministic.
  *
  * Numeric discipline: the metric is fixed-point-scaled to integer
  * "cents" (`scale` = 100 for 2-decimal metrics), so Σc and Σc² are EXACT
  * integer aggregates — partition order cannot perturb them (the Money
  * lesson applied to variance). σ then derives as identical IEEE ops from
  * identical integers on both engines: mean = Σc/n, var_pop = Σc²/n −
  * mean², var_samp = var_pop·n/(n−1). Per-stratum weights round-6; the
  * |strata|-row weight total is the only float sum (error ~1e-13 — a
  * quota floor flips only if N·w/W sits within that of an integer).
  * Exactness of Σc² in doubles holds while it stays under 2^53 — ~4M
  * rows/stratum at 5-digit cents; beyond that the comparison degrades
  * gracefully rather than wrongly.
  *
  * Strata with n < 2 or zero variance get weight 0 (no quota) — Neyman
  * has no information to allocate there; give them a floor upstream if
  * they must be represented.
  */
object StratifiedSample {

  def neyman(
      df: DataFrame,
      stratumCol: String,
      idCol: String,
      valueCol: String,
      totalN: Int,
      scale: Int = 100
  ): DataFrame = {
    require(totalN > 0, "totalN must be positive")
    require(scale > 0, "scale must be positive")
    val c = round(col(valueCol) * scale, 0).cast("long")
    val stats = df.groupBy(col(stratumCol)).agg(
      count(lit(1)).as("n_s"),
      sum(c).as("_sy"),
      sum(c * c).as("_syy"))
    val nD = col("n_s").cast("double")
    val m = col("_sy").cast("double") / nD
    val varPop = col("_syy").cast("double") / nD - m * m
    val varSamp = when(col("n_s") > 1, varPop * nD / (nD - 1.0)).otherwise(lit(0.0))
    val weighted = stats.withColumn("w_s",
      round(nD * sqrt(greatest(varSamp, lit(0.0))), 6))
    val total = weighted.agg(round(sum(col("w_s")), 6).as("_w_tot"))
    val quotas = weighted.crossJoin(broadcast(total))
      .withColumn("quota",
        when(col("_w_tot") > 0.0,
          least(floor(lit(totalN) * col("w_s") / col("_w_tot")).cast("long"), col("n_s")))
          .otherwise(lit(0L)))
      .select(col(stratumCol), col("n_s"), col("w_s"), col("quota"))
    val rank = row_number().over(
      Window.partitionBy(col(stratumCol))
        .orderBy(HashSplit.md548(col(idCol)), col(idCol))).cast("long")
    df.select(col(idCol), col(stratumCol))
      .withColumn("samp_rank", rank)
      .join(broadcast(quotas), Seq(stratumCol))
      .filter(col("samp_rank") <= col("quota"))
      .select(col(idCol), col(stratumCol), col("samp_rank"), col("quota"))
  }
}
