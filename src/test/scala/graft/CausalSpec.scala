package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Causal

/** Stratified causal effects: confounding separates naive from adjusted on
  * a planted fixture, and the Poisson-bootstrap CI brackets the point ATE
  * (the A/A-style contract from the verdict) deterministically.
  */
final class CausalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // Planted confounding: stratum 1 is both more-treated and higher-outcome.
  // Within each stratum treatment adds exactly +0.2 to the outcome rate, so
  // the standardized ATE is 0.2 while the naive contrast is inflated.
  private def confounded() = {
    def arm(s: Int, t: Int, nPos: Int, nNeg: Int, off: Int) =
      (0 until nPos).map(i => (s"$s-$t-p-${i + off}", t, 1, s)) ++
        (0 until nNeg).map(i => (s"$s-$t-n-${i + off}", t, 0, s))
    // stratum 0: P(y|t=0)=0.1, P(y|t=1)=0.3; 400 control / 100 treated
    // stratum 1: P(y|t=0)=0.5, P(y|t=1)=0.7; 100 control / 400 treated
    val rows = arm(0, 0, 40, 360, 0) ++ arm(0, 1, 30, 70, 0) ++
      arm(1, 0, 50, 50, 0) ++ arm(1, 1, 280, 120, 0)
    rows.toDF("id", "t", "y", "s")
  }

  test("adjustment recovers the planted within-stratum effect") {
    val r = Causal.stratifiedEffects(confounded(), "t", "y", "s").collect().head
    assert(r.getAs[Long]("n") === 1000L)
    assert(r.getAs[Long]("n_treated") === 500L)
    // naive: 310/500 - 90/500 = 0.44 (confounded upward)
    assert(r.getAs[Long]("naive_e6") === 440000L)
    // standardized ATE: exactly 0.2 in both strata
    assert(r.getAs[Long]("ate_e6") === 200000L)
    assert(r.getAs[Long]("att_e6") === 200000L)
  }

  test("bootstrap CI brackets the closed-form ATE and is deterministic") {
    def run() = Causal.stratifiedAteBootstrap(
      confounded(), "t", "y", "s", "id", b = 100).collect().head
    val r = run()
    val (ate, lo, hi) = (r.getAs[Long]("ate_e6"), r.getAs[Long]("lo_e6"),
      r.getAs[Long]("hi_e6"))
    assert(r.getAs[Long]("n") === 1000L)
    assert(r.getAs[Int]("b_reps") === 100)
    assert(lo <= ate && ate <= hi, s"[$lo, $hi] must bracket $ate")
    assert(hi > lo)
    // binomial-ish se ~ 0.03: the 95% CI half-width should be a few
    // percent — generous envelope, not a point value
    assert(hi - lo > 20000L && hi - lo < 300000L, s"width ${hi - lo}")
    assert(run().toSeq === r.toSeq)
  }
}
