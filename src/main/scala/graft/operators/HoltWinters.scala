package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Money

/** Additive Holt–Winters triple exponential smoothing (Winters 1960) over
  * the per-type daily revenue series — the classic level/trend/seasonal
  * forecaster, completing the time-series family next to EWMA (single
  * smoothing), Trend/RobustTrend (global slope) and Seasonal
  * (decomposition): one-step-ahead fits over the observed days plus an
  * H-step forecast from the final state.
  *
  * Exact-integer replay: y is the Money micros sum per (type, day); the
  * recursion runs entirely in BIGINT micros with tenths-rational
  * parameters (α = 2/10, β = 1/10, γ = 3/10) and TRUNCATING division —
  * Scala `Long./` on the Spark side, `trunc(CAST(n AS DOUBLE)/d)` in the
  * oracle (NOT `//`, which floors: level deltas and seasonals go
  * negative, where floor ≠ trunc). The double detour is exact while
  * |numerator| < 2⁵³ — daily revenue micros are ~10¹⁰.
  *
  * Scale shape: corpus-scale work is the ONE (type, day) aggregation;
  * the recursion is a bounded driver fixed point over |types|·|days|
  * aggregate rows (the BradleyTerry pattern — state is metadata-sized,
  * never corpus-sized). Types with fewer than m+1 observed days are
  * dropped (stated contract, same HAVING gate in the oracle); missing
  * days compress out of the series (both engines index observed days).
  */
object HoltWinters {

  val M = 7            // weekly season length
  val H = 7            // forecast horizon
  // α = 2/10, β = 1/10, γ = 3/10 as (numerator, 10) tenths

  /** Per-(type, day) revenue micros — the corpus-scale aggregation. */
  def dailySeries(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(Money.microsSum(col("value")).as("y_micros"))

  private def tdiv(n: Long, d: Long): Long = n / d // Long./ truncates

  /** One fit step: 1-based day idx, observed y, one-step-ahead fitted,
    * and the POST-update (level, trend).
    */
  private[operators] final case class Step(
      idx: Long, y: Long, fitted: Long, l: Long, b: Long)

  /** Per-type recursion result: the fit steps and the final state
    * (level, trend, seasonal slots s(0) = t−6 … s(6) = t).
    */
  private[operators] final case class Fitted(
      steps: IndexedSeq[Step], l: Long, b: Long, s: IndexedSeq[Long])

  /** THE recursion — single source of truth shared by [[fit]] and
    * [[mase]] (a drifted copy would silently decouple q_holt_winters
    * from q_forecast_mase). Requires y.length ≥ M + 1.
    */
  private[operators] def run(y: Array[Long]): Fitted = {
    var l = tdiv(y.take(M).sum, M.toLong)
    var b = 0L
    val s = Array.tabulate(M)(i => y(i) - l)
    val steps = IndexedSeq.newBuilder[Step]
    for (t <- M until y.length) {
      val sOld = s(0)
      val fitted = l + b + sOld
      val lNew = tdiv(2L * (y(t) - sOld) + 8L * (l + b), 10L)
      val bNew = tdiv((lNew - l) + 9L * b, 10L)
      val sNew = tdiv(3L * (y(t) - lNew) + 7L * sOld, 10L)
      System.arraycopy(s, 1, s, 0, M - 1)
      s(M - 1) = sNew
      l = lNew
      b = bNew
      steps += Step((t + 1).toLong, y(t), fitted, l, b)
    }
    Fitted(steps.result(), l, b, s.toIndexedSeq)
  }

  /** Bounded collect of the per-type series: |types| · |observed days|
    * aggregate rows, ordered by day, gated at M + 1 days.
    */
  private def collectSeries(events: DataFrame): Seq[(String, Array[Long])] =
    dailySeries(events).collect()
      .map(r => (r.getString(0), r.getDate(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (t, rows) => t -> rows.sortBy(_._2.getTime).map(_._3) }
      .toSeq.sortBy(_._1).filter(_._2.length >= M + 1)

  /** Fit + forecast rows:
    * (event_type, idx, kind, y_micros, pred_micros, level_micros,
    * trend_micros) — `fit` rows carry the one-step-ahead prediction made
    * BEFORE observing y_t and the post-update state; `forecast` rows
    * extrapolate h = 1..H from the final state (y_micros null).
    */
  def fit(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val out = Seq.newBuilder[(String, Long, String, Option[Long], Long, Long, Long)]
    for ((tpe, y) <- collectSeries(events)) {
      val f = run(y)
      for (st <- f.steps)
        out += ((tpe, st.idx, "fit", Some(st.y), st.fitted, st.l, st.b))
      for (h <- 1 to H)
        out += ((tpe, (y.length + h).toLong, "forecast", None,
          f.l + h.toLong * f.b + f.s(h - 1), f.l, f.b))
    }
    out.result().toDF("event_type", "idx", "kind", "y_micros",
      "pred_micros", "level_micros", "trend_micros")
  }

  /** MASE (Hyndman & Koehler 2006) of the one-step HW fits against the
    * seasonal-naive baseline (ŷ_t = y_{t−m}) over the same fit region:
    * mase_e6 = 10⁶ · Σ|y − fit| / Σ|y_t − y_{t−m}| — both sums exact
    * BIGINTs, the quotient a single truncating division (operands
    * non-negative, so DIV ≡ `//`). < 10⁶ means HW beats seasonal-naive.
    */
  def mase(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val out = Seq.newBuilder[(String, Long, Long, Long, Long)]
    for ((tpe, y) <- collectSeries(events)) {
      val f = run(y)
      val sae = f.steps.map(st => math.abs(st.y - st.fitted)).sum
      val snaive = (M until y.length).map(t => math.abs(y(t) - y(t - M))).sum
      // width bound (r18 ADVICE): sae·10⁶ is plain Long arithmetic while
      // the DuckDB twin sums into HUGEINT — past sae ≈ 9.2e12 micros the
      // two engines would silently diverge on a wrapped mase_e6, so fail
      // loudly instead (BradleyTerry/Krippendorff document their bounds
      // the same way; the daily-revenue series sits ~6 orders below this).
      require(sae <= Long.MaxValue / 1000000L,
        s"HoltWinters.mase: sae=$sae micros would overflow sae*1e6; " +
          "aggregate the series at a coarser unit first")
      val m6 = if (snaive == 0L) 0L else tdiv(sae * 1000000L, snaive)
      out += ((tpe, f.steps.length.toLong, sae, snaive, m6))
    }
    out.result().toDF("event_type", "n_fit", "sae_micros", "snaive_micros", "mase_e6")
  }
}
