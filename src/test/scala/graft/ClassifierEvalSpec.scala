package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ClassifierEval

/** Closed-form evaluation battery: hand-computed PRF cell, exact
  * calibration decomposition, and gains invariants (monotone cumulative,
  * terminal gain = 100%).
  */
final class ClassifierEvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // (id, score_micros, label)
  private lazy val scored = Seq(
    ("a", 850000L, 1), ("b", 850000L, 1),
    ("c", 600000L, 1), ("d", 600000L, 0),
    ("e", 50000L, 0), ("f", 50000L, 0), ("g", 50000L, 0), ("h", 50000L, 1)
  ).toDF("id", "score_micros", "label")

  test("PRF at one threshold, hand-computed") {
    val got = ClassifierEval.prfSweep(scored, "score_micros", "label", Seq(600000L))
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].head()
    // pred-pos = 4 (tp 3, fp 1); fn 1; tn 3; p = r = f1 = 0.75
    assert(got === ((600000L, 3L, 1L, 1L, 3L, 750000L, 750000L, 750000L)))
  }

  test("calibration decomposition, exact per bucket") {
    val got = ClassifierEval.calibration(scored, "score_micros", "label")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(850000L) === ((850000L, 2L, 2L, 1000000L, 150000L, 37500L)))
    assert(got(600000L) === ((600000L, 2L, 1L, 500000L, 100000L, 25000L)))
    assert(got(50000L) === ((50000L, 4L, 1L, 250000L, 200000L, 100000L)))
  }

  test("AUC: hand-computed tie-aware Mann-Whitney") {
    val got = ClassifierEval.aucExact(scored, "score_micros", "label")
      .as[(Long, Long, Long)].head()
    // pos>neg pairs: a,b beat all 4 (8); c ties d (.5) + beats 3 (3);
    // h loses d, ties e,f,g (1.5) → 13/16 = 0.8125
    assert(got === ((4L, 4L, 812500L)))
    // degenerate single-class → 0 by convention
    val onePos = ClassifierEval.aucExact(
      scored.filter($"label" === 1), "score_micros", "label")
      .as[(Long, Long, Long)].head()
    assert(onePos === ((4L, 0L, 0L)))
  }

  test("gains: cumulative is monotone and terminal gain is 100%") {
    val rows = ClassifierEval.gainsByDecile(scored, "score_micros", "label", "id")
      .orderBy("decile")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.map(_._2).sum === 8L)
    assert(rows.map(_._4).toSeq === rows.map(_._4).toSeq.sorted)
    assert(rows.last._4 === 4L) // all positives found by the last decile
    assert(rows.last._5 === 1000000L)
    // top decile holds a top-score positive
    assert(rows.head._3 >= 1L)
  }

  test("agreement: hand-computed kappa and MCC on a 40/10/20/30 table") {
    import spark.implicits._
    val rows =
      Seq.fill(40)((700000L, 1)) ++ Seq.fill(10)((700000L, 0)) ++
        Seq.fill(20)((0L, 1)) ++ Seq.fill(30)((0L, 0))
    val df = rows.toDF("score_micros", "label")
    val r = ClassifierEval.agreement(df, "score_micros", "label", 600000L)
      .collect().head
    assert(r.getLong(0) === 100L)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      === ((40L, 10L, 20L, 30L)))
    // po = 0.7, pe = 0.5 → kappa = 0.4; MCC = 1000/sqrt(6e6) = 0.408248
    assert(r.getLong(5) === 400000L)
    assert(r.getLong(6) === 408248L)
  }

  test("isotonic: PAV pools the classic violating sequence; averages preserved") {
    import spark.implicits._
    import graft.operators.Isotonic
    // tiers (score → rate): 10→0.2(1/5), 20→0.6(3/5), 30→0.4(2/5), 40→0.8(4/5)
    // PAV merges tiers 2+3 → pooled 5/10 = 0.5: iso = 0.2, 0.5, 0.5, 0.8
    val rows =
      (Seq.fill(1)((10L, 1)) ++ Seq.fill(4)((10L, 0))) ++
        (Seq.fill(3)((20L, 1)) ++ Seq.fill(2)((20L, 0))) ++
        (Seq.fill(2)((30L, 1)) ++ Seq.fill(3)((30L, 0))) ++
        (Seq.fill(4)((40L, 1)) ++ Seq.fill(1)((40L, 0)))
    val got = Isotonic.calibrate(rows.toDF("score_micros", "label"),
      "score_micros", "label")
      .orderBy("score_micros")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.map(_._5).toSeq === Seq(200000L, 500000L, 500000L, 800000L))
    // monotone, and pooled mass preserved: Σ n·iso == Σ pos (exact here)
    assert(got.map(_._5).toSeq === got.map(_._5).toSeq.sorted)
    assert(got.map(t => t._2 * t._5).sum === got.map(_._3).sum * 1000000L)
  }

  test("isotonic: over-cap tier count fails loudly, at-cap passes") {
    import graft.operators.Isotonic
    import spark.implicits._
    val five = (1L to 5L).map(s => (s * 10L, (s % 2).toInt))
      .toDF("score_micros", "label")
    val e = intercept[Exception] {
      Isotonic.calibrate(five, "score_micros", "label", maxTiers = 4).collect()
    }
    assert(e.getMessage.contains("distinct scores") ||
      Option(e.getCause).exists(_.getMessage.contains("distinct scores")))
    // exactly at the cap: no raise, all tiers emitted
    assert(Isotonic.calibrate(five, "score_micros", "label", maxTiers = 5)
      .count() === 5L)
  }

  test("agreement: degenerate one-class margins report 0") {
    import spark.implicits._
    val df = Seq.fill(10)((0L, 1)).toDF("score_micros", "label")
    val r = ClassifierEval.agreement(df, "score_micros", "label", 600000L)
      .collect().head
    assert(r.getLong(5) === 0L)
    assert(r.getLong(6) === 0L)
  }
}
