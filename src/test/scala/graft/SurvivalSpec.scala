package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Survival

/** Kaplan–Meier on a hand-computed fixture: 6 subjects, durations
  * (1 obs)(1 obs)(2 cens)(3 obs)(3 cens)(4 obs).
  *   t=1: n=6 d=2 → lnS = ln(4/6) = −405465 e6; NA = 2e6 DIV 6 = 333333
  *   t=3: n=3 d=1 → lnS += ln(2/3) → −810930; NA += 333333 → 666666
  *   t=4: n=1 d=1 → terminal S=0 → km NULL; NA += 1000000 → 1666666
  * (t=2 has no events → no row). Plus the structural properties: n_risk is
  * strictly decreasing, km_ln_e6 non-increasing, NA non-decreasing.
  */
final class SurvivalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val fix = Seq(
    (1L, true), (1L, true), (2L, false), (3L, true), (3L, false), (4L, true)
  ).toDF("duration_h", "observed")

  test("hand-computed product-limit and hazard") {
    val rows = Survival.kaplanMeier(fix, "duration_h", "observed")
      .orderBy("t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getLong(4)))
    assert(rows.toSeq === Seq(
      (1L, 6L, 2L, Some(-405465L), 333333L),
      (3L, 3L, 1L, Some(-810930L), 666666L),
      (4L, 1L, 1L, None, 1666666L)))
  }

  test("monotonicity on the events-derived durations") {
    val dur = Survival.timeToEvent(
      graft.sources.Tables(spark, "/root/testdata/sf0.001").events,
      "user_id", "event_type", "purchase")
    val rows = Survival.kaplanMeier(dur, "duration_h", "observed")
      .orderBy("t").collect()
    assert(rows.nonEmpty)
    val risks = rows.map(_.getLong(1))
    assert(risks.zip(risks.tail).forall { case (a, b) => a > b })
    val kms = rows.filter(!_.isNullAt(3)).map(_.getLong(3))
    assert(kms.zip(kms.tail).forall { case (a, b) => a >= b })
    val nas = rows.map(_.getLong(4))
    assert(nas.zip(nas.tail).forall { case (a, b) => a <= b })
    // every subject shows up in exactly one risk-set decrement path:
    // n_risk at the first event time == the number of subjects with
    // duration >= that time
    val n0 = rows.head.getLong(1)
    val t0 = rows.head.getLong(0)
    val expected = dur.filter(org.apache.spark.sql.functions.col("duration_h") >= t0).count()
    assert(n0 === expected)
  }

  test("log-rank: planted separation rejects, A/A accepts") {
    // arm 0 dies at t=1..10, arm 1 at t=11..20 — total separation
    val sep = ((1L to 10L).map(t => (t, true, 0L)) ++
      (11L to 20L).map(t => (t, true, 1L)))
      .toDF("duration_h", "observed", "arm")
    val r = Survival.logRank(sep, "duration_h", "observed", "arm").collect().head
    assert(r.getLong(0) === 10L && r.getLong(1) === 10L) // n0, n1
    assert(r.getLong(2) === 10L && r.getLong(3) === 10L) // o0, o1
    // arm 1 outlives arm 0: O1 < E1 -> z negative, strongly significant
    assert(r.getLong(6) < 0L, s"z_e6 = ${r.getLong(6)}")
    assert(r.getLong(7) < 50000L, s"p_e6 = ${r.getLong(7)}")

    // A/A: identical duration multisets per arm (even event counts so the
    // per-time E1 = d/2 is exact) -> z exactly 0, p exactly 1
    val aa = (1L to 8L).flatMap(t => Seq((t, true, 0L), (t, true, 1L)))
      .toDF("duration_h", "observed", "arm")
    val r2 = Survival.logRank(aa, "duration_h", "observed", "arm").collect().head
    assert(r2.getLong(6) === 0L)
    assert(r2.getLong(7) === 1000000L)
  }

  test("log-rank: degenerate single-arm input yields NULL z/p") {
    val solo = Seq((1L, true, 0L), (2L, true, 0L))
      .toDF("duration_h", "observed", "arm")
    val r = Survival.logRank(solo, "duration_h", "observed", "arm").collect().head
    // every event time has n1r = 0 -> all V terms 0 -> no test statistic
    assert(r.isNullAt(6) && r.isNullAt(7))
  }

  test("stratified log-rank: confounded strata fool the pooled test, not the stratified one") {
    // stratum A: short durations (1..4), arm 1 holds 3/4 of subjects;
    // stratum B: long durations (11..14), arm 0 holds 3/4. WITHIN each
    // stratum the two arms die at identical times in identical proportions
    // (per time: 1 arm-0 + 3 arm-1 deaths in A, 3 + 1 in B), so the true
    // arm effect is nil — but pooled, arm 1 looks short-lived.
    val rows =
      (1L to 4L).flatMap(t => Seq((t, true, 0L, "A")) ++ Seq.fill(3)((t, true, 1L, "A"))) ++
        (11L to 14L).flatMap(t => Seq.fill(3)((t, true, 0L, "B")) ++ Seq((t, true, 1L, "B")))
    val df = rows.toDF("duration_h", "observed", "arm", "tier")
    val pooled = Survival.logRank(df, "duration_h", "observed", "arm").collect().head
    // pooled: arm 1 concentrated in the early-death stratum -> strong signal
    assert(math.abs(pooled.getLong(6)) > 1000000L, s"pooled z_e6 = ${pooled.getLong(6)}")
    val strat = Survival.logRankStratified(
      df, "duration_h", "observed", "arm", "tier").collect().head
    assert(strat.getAs[Long]("n_strata") === 2L)
    assert(strat.getAs[Long]("n0") === 16L && strat.getAs[Long]("n1") === 16L)
    // within-stratum arm proportions are constant over time, so O1 = E1
    // exactly at every event time -> z exactly 0, p exactly 1
    assert(strat.getAs[Long]("z_e6") === 0L, s"strat z_e6 = ${strat.getAs[Long]("z_e6")}")
    assert(strat.getAs[Long]("p_e6") === 1000000L)
  }
}
