package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Right-censored survival analysis: the Kaplan–Meier product-limit
  * estimator (1958) and the Nelson–Aalen cumulative hazard, over a
  * durations table `(duration, observed)` — duration an integer time
  * bucket, `observed` true when the event happened (false = censored at
  * that duration). The classic churn/retention view: "what fraction of
  * users have NOT yet converted by hour t, accounting for users we simply
  * stopped observing".
  *
  * Replay discipline: risk sets and event counts are exact BIGINTs (n_i =
  * N − Σ_{t<t_i} all_n, one bounded window over the per-duration
  * aggregate). The KM survival is emitted in log space —
  * ln S(t) = Σ ln((n_i−d_i)/n_i) — with each term's single double division
  * e6-quantized BEFORE the cumulative sum (the Zipf/NMI ln rule), so the
  * sum is an exact BIGINT; no exp() crosses an engine boundary. The
  * Nelson–Aalen terms are pure integer division d·10⁶ DIV n (non-negative,
  * so Spark DIV ≡ DuckDB //). If everyone at risk dies at the last event
  * time (n_i = d_i, S = 0, ln undefined) the row's km_ln_e6 is NULL by the
  * same CASE on both engines.
  *
  * Scale shape: one map-side-combined groupBy collapses N rows onto the
  * per-duration table — bounded by the duration-bucket range (hours in a
  * finite observation window), NOT by row count — and every window below
  * runs over that bounded aggregate. The canonical KM-at-scale shape: never
  * a per-subject sort, never a range join.
  */
object Survival {

  private def e6(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    floor(c * lit(1000000.0d) + lit(0.5d)).cast("long")

  /** Per-user time-to-first-`eventType` durations from an events table
    * carrying `ts_ns`: duration = hours from the user's first event to
    * their first `eventType` event (observed) or to their last event
    * (censored). Exact micros arithmetic (`ts_ns DIV 1000`), hour buckets
    * via non-negative integer division.
    */
  def timeToEvent(events: DataFrame, userCol: String, eventTypeCol: String,
      eventType: String): DataFrame = {
    val us = expr("ts_ns DIV 1000")
    events
      .select(col(userCol).as("u"), col(eventTypeCol).as("et"), us.as("t_us"))
      .groupBy(col("u"))
      .agg(
        min(col("t_us")).as("t0"),
        min(when(col("et") === eventType, col("t_us"))).as("tev"),
        max(col("t_us")).as("tl"))
      .select(col("u"),
        // integer DIV, not `/` (double division could round a just-below-
        // integer quotient up; operands are non-negative so DIV ≡ //)
        expr("(coalesce(tev, tl) - t0) DIV 3600000000").as("duration_h"),
        col("tev").isNotNull.as("observed"))
  }

  /** Two-sample log-rank (Mantel–Haenszel 1966) test between arms 0 and 1
    * of a censored durations table — the time-to-event A/B test that
    * belongs next to [[kaplanMeier]]: "do the two arms share a survival
    * curve?", aggregating the per-event-time 2×2 tables into
    * O₁ − E₁ over its hypergeometric variance.
    *
    * One summary row `(n0, n1, o0, o1, e1_e6, v_e6, z_e6, p_e6)`: arm
    * sizes, observed events per arm, Σ E₁ᵢ = Σ dᵢ·n₁ᵢ/nᵢ and
    * Σ Vᵢ = Σ dᵢ·(nᵢ−dᵢ)·n₀ᵢ·n₁ᵢ/(nᵢ²·(nᵢ−1)) (both e6-quantized PER
    * EVENT TIME before the exact integer sums — the PSI per-term rule),
    * z = (O₁−E₁)/√V and the two-sided p-value through the shared
    * Zelen–Severo tail ([[MultipleTesting.normSf]]). Degenerate inputs
    * (no events, or V = 0 because one arm never co-exists with events)
    * yield NULL z/p by the same CASE on both engines.
    *
    * Replay discipline: risk sets per arm are exact BIGINTs from the same
    * bounded before-window as [[kaplanMeier]]; each E/V term is ONE
    * fixed-spelling double expression over exact integers (every factor
    * cast individually — no BIGINT product that could hit the ANSI 2⁶³
    * ceiling at corpus scale). Scale shape: one map-side-combined groupBy
    * collapses the corpus onto the per-duration grid; every window and
    * the final 1-row aggregate run over that bounded table.
    */
  def logRank(durations: DataFrame, durCol: String, obsCol: String,
      armCol: String): DataFrame = {
    val g = durations.groupBy(col(durCol).as("t"))
      .agg(
        sum(when(col(armCol) === 0L, 1L).otherwise(0L)).as("an0"),
        sum(when(col(armCol) === 1L, 1L).otherwise(0L)).as("an1"),
        sum(when(col(armCol) === 0L && col(obsCol), 1L).otherwise(0L)).as("dd0"),
        sum(when(col(armCol) === 1L && col(obsCol), 1L).otherwise(0L)).as("dd1"))
    val tot = g.agg(sum(col("an0")).as("nn0"), sum(col("an1")).as("nn1"))
    val before = Window.orderBy(col("t")).rowsBetween(Window.unboundedPreceding, -1)
    val risky = g.crossJoin(broadcast(tot))
      .withColumn("n0r", col("nn0") - coalesce(sum(col("an0")).over(before), lit(0L)))
      .withColumn("n1r", col("nn1") - coalesce(sum(col("an1")).over(before), lit(0L)))
      .withColumn("d", col("dd0") + col("dd1"))
      .withColumn("nr", col("n0r") + col("n1r"))
      .filter(col("d") > 0L)
    val eterm = floor(col("d").cast("double") * col("n1r").cast("double")
      / col("nr").cast("double") * lit(1000000.0d) + lit(0.5d)).cast("long")
    val vterm = when(col("nr") > 1L,
      floor(col("d").cast("double") * (col("nr") - col("d")).cast("double")
        * col("n0r").cast("double") * col("n1r").cast("double")
        / (col("nr").cast("double") * col("nr").cast("double")
          * (col("nr") - lit(1L)).cast("double"))
        * lit(1000000.0d) + lit(0.5d)).cast("long")).otherwise(lit(0L))
    val ag = risky.agg(
      max(col("nn0")).as("n0"), max(col("nn1")).as("n1"),
      sum(col("dd0")).as("o0"), sum(col("dd1")).as("o1"),
      sum(eterm).as("e1_e6"), sum(vterm).as("v_e6"))
    val z = (col("o1") * lit(1000000L) - col("e1_e6")).cast("double") /
      (lit(1000.0d) * sqrt(col("v_e6").cast("double")))
    ag.select(col("n0"), col("n1"), col("o0"), col("o1"), col("e1_e6"), col("v_e6"),
      when(col("v_e6") > 0L,
        floor(z * lit(1000000.0d) + lit(0.5d)).cast("long")).as("z_e6"),
      when(col("v_e6") > 0L,
        floor(lit(2.0d) * MultipleTesting.normSf(abs(z)) * lit(1000000.0d)
          + lit(0.5d)).cast("long")).as("p_e6"))
  }

  /** Stratified log-rank test — the [[logRank]] a reviewer asks for when
    * arms are imbalanced across strata: per-stratum per-event-time 2×2
    * tables, O₁−E₁ and V summed across strata BEFORE the single z
    * (Mantel–Haenszel pooling), so a covariate that shifts both arm
    * assignment and baseline hazard cannot masquerade as a treatment
    * effect (the classic confounded-strata failure of the pooled test).
    *
    * One row `(n_strata, n0, n1, o0, o1, e1_e6, v_e6, z_e6, p_e6)` —
    * identical term spellings to [[logRank]], with risk sets computed per
    * stratum (the before-window partitions by stratum) and the E/V terms
    * e6-quantized per (stratum, event time) before the exact integer
    * sums. Degenerate inputs (V = 0) yield NULL z/p by the same CASE.
    *
    * Scale shape: one map-side-combined groupBy onto the per-(stratum,
    * duration) grid (bounded by |strata|·|duration buckets|), a broadcast
    * join of the |strata|-row totals, windows partitioned BY STRATUM over
    * the bounded grid, and two 1-row aggregates spliced by broadcast.
    */
  def logRankStratified(durations: DataFrame, durCol: String, obsCol: String,
      armCol: String, strataCol: String): DataFrame = {
    val g = durations.groupBy(col(strataCol).as("st"), col(durCol).as("t"))
      .agg(
        sum(when(col(armCol) === 0L, 1L).otherwise(0L)).as("an0"),
        sum(when(col(armCol) === 1L, 1L).otherwise(0L)).as("an1"),
        sum(when(col(armCol) === 0L && col(obsCol), 1L).otherwise(0L)).as("dd0"),
        sum(when(col(armCol) === 1L && col(obsCol), 1L).otherwise(0L)).as("dd1"))
    val tot = g.groupBy(col("st"))
      .agg(sum(col("an0")).as("nn0"), sum(col("an1")).as("nn1"))
    val before = Window.partitionBy(col("st")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val risky = g.join(broadcast(tot), Seq("st"))
      .withColumn("n0r", col("nn0") - coalesce(sum(col("an0")).over(before), lit(0L)))
      .withColumn("n1r", col("nn1") - coalesce(sum(col("an1")).over(before), lit(0L)))
      .withColumn("d", col("dd0") + col("dd1"))
      .withColumn("nr", col("n0r") + col("n1r"))
      .filter(col("d") > 0L)
    val eterm = floor(col("d").cast("double") * col("n1r").cast("double")
      / col("nr").cast("double") * lit(1000000.0d) + lit(0.5d)).cast("long")
    val vterm = when(col("nr") > 1L,
      floor(col("d").cast("double") * (col("nr") - col("d")).cast("double")
        * col("n0r").cast("double") * col("n1r").cast("double")
        / (col("nr").cast("double") * col("nr").cast("double")
          * (col("nr") - lit(1L)).cast("double"))
        * lit(1000000.0d) + lit(0.5d)).cast("long")).otherwise(lit(0L))
    val sizes = tot.agg(count(lit(1)).as("n_strata"),
      sum(col("nn0")).as("n0"), sum(col("nn1")).as("n1"))
    val terms = risky.agg(
      sum(col("dd0")).as("o0"), sum(col("dd1")).as("o1"),
      sum(eterm).as("e1_e6"), sum(vterm).as("v_e6"))
    val z = (col("o1") * lit(1000000L) - col("e1_e6")).cast("double") /
      (lit(1000.0d) * sqrt(col("v_e6").cast("double")))
    sizes.crossJoin(broadcast(terms))
      .select(col("n_strata"), col("n0"), col("n1"), col("o0"), col("o1"),
        col("e1_e6"), col("v_e6"),
        when(col("v_e6") > 0L,
          floor(z * lit(1000000.0d) + lit(0.5d)).cast("long")).as("z_e6"),
        when(col("v_e6") > 0L,
          floor(lit(2.0d) * MultipleTesting.normSf(abs(z)) * lit(1000000.0d)
            + lit(0.5d)).cast("long")).as("p_e6"))
  }

  /** `(t, n_risk, d, km_ln_e6, na_e6)` — one row per duration bucket with
    * at least one observed event, ordered facts: n_risk subjects at risk at
    * t, d events at t, cumulative ln-survival (e6, NULL once S hits 0) and
    * cumulative hazard (e6).
    */
  def kaplanMeier(durations: DataFrame, durCol: String, obsCol: String): DataFrame = {
    val g = durations.groupBy(col(durCol).as("t"))
      .agg(count(lit(1)).as("all_n"),
        sum(when(col(obsCol), lit(1L)).otherwise(lit(0L))).as("d"))
      // bounded by construction: one row per duration bucket
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = g.agg(sum(col("all_n")).as("nn"))
    val before = Window.orderBy(col("t")).rowsBetween(Window.unboundedPreceding, -1)
    val risky = g.crossJoin(broadcast(total))
      .withColumn("n_risk", col("nn") - coalesce(sum(col("all_n")).over(before), lit(0L)))
      .filter(col("d") > 0L)
    val lnTerm = when(col("d") < col("n_risk"),
      e6(log((col("n_risk") - col("d")).cast("double") / col("n_risk").cast("double"))))
    val naTerm = expr("d * 1000000 DIV n_risk")
    val upTo = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    risky
      .withColumn("km_ln_e6",
        when(col("d") < col("n_risk"),
          sum(coalesce(lnTerm, lit(0L))).over(upTo).cast("long")))
      .withColumn("na_e6", sum(naTerm).over(upTo).cast("long"))
      .select(col("t"), col("n_risk"), col("d"), col("km_ln_e6"), col("na_e6"))
  }
}
