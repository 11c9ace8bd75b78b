package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Money

/** Rank correlations — Spearman's ρ and Kendall's τ-b between two daily
  * metrics per group (revenue micros vs event count), completing the
  * association family next to [[Correlation]] (Pearson) and [[RankTest]]
  * (rank-sum testing): the monotone-dependence measures an analyst
  * reaches for when the relationship isn't linear.
  *
  * Exactness: ranks are DOUBLED average ranks (2·rank + ties − 1 — the
  * half-rank tie convention kept integral), so every Spearman moment sum
  * is an exact BIGINT; Kendall's concordant/discordant/tie counts come
  * from sign comparisons (never a product of differences — metric diffs
  * square past 2⁶³). The only doubles are the final ratios; `sqrt` is
  * IEEE-exact in both engines, so round-6 is safe.
  *
  * Scale shape: one (group, day) aggregation; rank windows partition by
  * group over the bounded per-group day rows; the Kendall pair join is a
  * within-group self-join on the SAME bounded table (|days|²/2 rows per
  * group — day-grain metadata, never corpus rows).
  */
object RankCorrelation {

  /** Per-(type, day) metric pair: revenue micros and event count. */
  def dailyMetrics(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(Money.microsSum(col("value")).as("x"),
        count(lit(1)).as("y"))

  /** Doubled average rank of `c` within the group: 2·rank + ties − 1
    * (integral even under ties — avg rank halves stay exact).
    */
  private def dRank(c: String): Column =
    (lit(2L) * rank().over(org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col(c))).cast("long") +
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type"), col(c))).cast("long") - lit(1L))

  /** One row per group: n_days, Kendall counts (c, d, tx, ty), tau_b,
    * and Spearman's rho from exact doubled-rank moment sums.
    */
  def correlate(events: DataFrame): DataFrame = {
    val daily = dailyMetrics(events)
    val ranked = daily.select(col("event_type"), col("day"),
      col("x"), col("y"), dRank("x").as("rx"), dRank("y").as("ry"))
    // Spearman moments over doubled ranks — exact BIGINTs
    val sp = ranked.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("rx")).as("sx"), sum(col("ry")).as("sy"),
        sum(col("rx") * col("rx")).as("sxx"),
        sum(col("ry") * col("ry")).as("syy"),
        sum(col("rx") * col("ry")).as("sxy"))
    // Kendall pairs: within-group self-join on the bounded daily table
    val a = daily.as("a")
    val b = daily.as("b")
    val pairs = a.join(b,
      col("a.event_type") === col("b.event_type") && col("a.day") < col("b.day"))
    def cmp(s: String): Column = when(col(s"a.$s") > col(s"b.$s"), 1)
      .when(col(s"a.$s") < col(s"b.$s"), -1).otherwise(0)
    val kd = pairs.select(col("a.event_type").as("event_type"),
      cmp("x").as("cx"), cmp("y").as("cy"))
      .groupBy(col("event_type"))
      .agg(
        sum(when(col("cx") * col("cy") === 1, 1L).otherwise(0L)).as("c"),
        sum(when(col("cx") * col("cy") === -1, 1L).otherwise(0L)).as("d"),
        sum(when(col("cx") === 0, 1L).otherwise(0L)).as("tx"),
        sum(when(col("cy") === 0, 1L).otherwise(0L)).as("ty"))
    val j = sp.join(kd, Seq("event_type"))
    val n0 = (col("n") * (col("n") - 1) / lit(2)).cast("long")
    val rhoNum = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val rhoDen = sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
      (col("n") * col("syy") - col("sy") * col("sy")).cast("double"))
    val tauDen = sqrt((n0 - col("tx")).cast("double") * (n0 - col("ty")).cast("double"))
    j.select(col("event_type"), col("n").as("n_days"),
      col("c"), col("d"), col("tx"), col("ty"),
      when(tauDen === 0.0, lit(0.0))
        .otherwise(round((col("c") - col("d")).cast("double") / tauDen, 6)).as("tau_b"),
      when(rhoDen === 0.0, lit(0.0))
        .otherwise(round(rhoNum / rhoDen, 6)).as("rho"))
  }
}
