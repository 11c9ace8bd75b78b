package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Money

/** Two-sided CUSUM control chart (Page 1954) over the per-type daily
  * revenue series — the sequential drift detector next to [[Ewma]]
  * (smoothing), [[Changepoint]] (offline split) and [[Psi]] (distribution
  * shift): S⁺ accumulates upward excursions beyond an allowance κ, S⁻
  * downward, and an alarm fires when either exceeds the decision
  * threshold h.
  *
  * The textbook recursion S⁺_t = max(0, S⁺_{t−1} + (y_t − μ) − κ) has the
  * closed form S⁺_t = C_t − min_{0≤j≤t} C_j with C_t = Σ_{i≤t}(y_i − μ − κ)
  * (running sum minus running min, C_0 = 0) — WINDOW-EXPRESSIBLE, so the
  * whole chart is two partitioned windows over the (type, day) aggregate:
  * no recursion, no driver state, identical spelling in the oracle.
  *
  * All arithmetic is exact BIGINT micros: μ is the truncated mean of the
  * first `refDays` days (the in-control reference), κ = μ DIV 20 (5%
  * allowance) and h = μ DIV 4 (25% decision interval) — integer contract
  * parameters, so both engines agree bit-for-bit.
  *
  * Scale shape: one (type, day) aggregation shuffle; every window is
  * PARTITIONED BY TYPE over the bounded per-type day rows — never a
  * global window.
  */
object Cusum {

  val RefDays = 7

  def chart(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(Money.microsSum(col("value")).as("y"))
    val byType = Window.partitionBy(col("event_type"))
    val order = byType.orderBy(col("day"))
    val idx = row_number().over(order)
    val withIdx = daily.select(col("event_type"), col("day"), col("y"),
      idx.as("idx"),
      count(lit(1)).over(byType).as("n_days"))
      // a type with fewer than refDays observed days has no in-control
      // reference week — dividing its partial sum by refDays would bias μ
      // low and fire guaranteed spurious alarms; drop it (stated
      // contract, the HoltWinters short-series gate)
      .where(col("n_days") >= RefDays)
    // in-control reference: truncated mean of the first refDays days
    val mu = expr(s"sum(CASE WHEN idx <= $RefDays THEN y ELSE 0 END) " +
      s"OVER (PARTITION BY event_type) DIV $RefDays")
    val withMu = withIdx.select(col("event_type"), col("day"), col("idx"),
      col("y"), mu.as("mu"))
      .select(col("event_type"), col("day"), col("idx"), col("y"), col("mu"),
        expr("mu DIV 20").as("kappa"), expr("mu DIV 4").as("h"))
    // C⁺ = Σ (y − μ − κ); S⁺ = C⁺ − min(0, running min of C⁺)
    val runOrder = Window.partitionBy(col("event_type")).orderBy(col("idx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def sPlusMinus(sign: Int): (Column, Column) = {
      val step =
        if (sign > 0) col("y") - col("mu") - col("kappa")
        else col("mu") - col("y") - col("kappa")
      val c = sum(step).over(runOrder)
      (c, c - least(lit(0L), min(c).over(runOrder)))
    }
    val (_, sPlus) = sPlusMinus(1)
    val (_, sMinus) = sPlusMinus(-1)
    withMu.select(col("event_type"), col("idx"), col("y"), col("mu"),
      sPlus.as("s_plus"), sMinus.as("s_minus"),
      (sPlus > col("h") || sMinus > col("h")).as("alarm"))
  }
}
