package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bootstrap

/** Poisson bootstrap: the CDF constants, the CI-brackets-the-mean
  * contract, a sane interval width on a known-variance fixture, and
  * determinism.
  */
final class BootstrapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("Poisson(1) CDF thresholds are the textbook values") {
    val c = Bootstrap.PoissonCdf
    assert(c.length === 8)
    assert(math.abs(c(0) - math.exp(-1.0)) < 1e-15)
    assert(math.abs(c(1) - 2.0 * math.exp(-1.0)) < 1e-15)
    assert(c.sliding(2).forall { case Seq(a, b) => b > a })
    assert(c.last > 0.99998 && c.last < 1.0)
  }

  test("CI brackets the point mean and has positive width") {
    val df = (1L to 1000L).map(i => (i, i % 100)).toDF("id", "v")
    val r = Bootstrap.poissonMeanCi(df, "v", "id", b = 100).collect().head
    val (n, mean, lo, hi) =
      (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(n === 1000L)
    // exact mean of (i % 100) over 1..1000 = 49.5 -> 49500000 micros
    assert(mean === 49500000L)
    assert(lo <= mean && mean <= hi, s"[$lo, $hi] must bracket $mean")
    assert(hi > lo)
    // sd(v) ~ 28.9, se ~ 0.91: the 95% CI half-width should sit around
    // 1.8e6 micros — assert a generous envelope, not a point value
    assert(hi - lo > 1000000L && hi - lo < 10000000L, s"width ${hi - lo}")
  }

  test("deterministic across runs") {
    val df = (1L to 500L).map(i => (i, i)).toDF("id", "v")
    def run() = Bootstrap.poissonMeanCi(df, "v", "id", b = 50).collect().head.toSeq
    assert(run() === run())
  }

  test("A/A uplift: a signal-free split's interval brackets zero") {
    // arms assigned by id parity, identical value distribution in both
    val df = (1L to 2000L).map(i => (i, i % 2, (i / 2) % 50)).toDF("id", "arm", "v")
    val r = Bootstrap.poissonDiffCi(df, "v", "arm", "id", b = 100).collect().head
    val (n0, n1, diff, lo, hi) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(n0 === 1000L && n1 === 1000L)
    assert(lo <= 0L && 0L <= hi, s"A/A interval [$lo, $hi] must bracket 0")
    assert(lo <= diff && diff <= hi)
    assert(hi > lo)
  }
}
