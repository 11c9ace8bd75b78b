package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Doremi

/** Independent driver-side replica of the DoReMi reweighting arithmetic
  * (same quantization points), plus the qualitative contracts: harder
  * domains gain weight, the smoothing floor holds, weights ≈ sum to 1.
  */
final class DoremiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("matches an independent replica and boosts the high-loss domain") {
    import spark.implicits._
    // domain a: 4 docs, mean loss 2.0 nats; domain b: 2 docs, mean 5.0
    val docs = Seq(
      (1L, "a"), (2L, "a"), (3L, "a"), (4L, "a"), (5L, "b"), (6L, "b")
    ).toDF("doc_id", "source")
    val loss = Seq(
      1L -> 2000000L, 2L -> 1500000L, 3L -> 2500000L, 4L -> 2000000L,
      5L -> 5000000L, 6L -> 5000000L
    ).toDF("doc_id", "loss_e6")
    val got = Doremi.weights(docs, loss).collect()
      .map(r => r.getString(0) -> r).toMap

    // replica
    def pexp(x: Double): Double = {
      var e = 1.0 + x / 65536.0
      (1 to 16).foreach(_ => e = e * e)
      e
    }
    val sums = Map("a" -> 8000000L, "b" -> 10000000L)
    val ns = Map("a" -> 4L, "b" -> 2L)
    val tn = 6L
    val ts = 18000000L
    val exc = sums.map { case (s, se) =>
      s -> math.floor(
        math.max(0.0, se.toDouble / ns(s) - ts.toDouble / tn) + 0.5).toLong
    }
    assert(exc("a") === 0L)       // below corpus mean → clipped
    assert(exc("b") === 2000000L) // 5.0 − 3.0 nats in micros
    val wE6 = sums.keys.map { s =>
      s -> math.floor(
        math.sqrt(ns(s).toDouble / tn) * pexp(exc(s).toDouble / 1000000.0)
          * 1000000.0 + 0.5).toLong
    }.toMap
    val totW = wE6.values.sum
    sums.keys.foreach { s =>
      assert(got(s).getAs[Long]("excess_e6") === exc(s))
      assert(got(s).getAs[Long]("w_e6") === wE6(s))
      val expect = math.floor(
        (0.99 * wE6(s) / totW + 0.01 / 2.0) * 1000000.0 + 0.5) / 1000000.0
      assert(got(s).getAs[Double]("weight") === expect)
    }
    // hard domain b ends ABOVE its count share (2/6), easy domain a below
    assert(got("b").getAs[Double]("weight") > 2.0 / 6.0)
    assert(got("a").getAs[Double]("weight") < 4.0 / 6.0)
    val totalW = got.values.map(_.getAs[Double]("weight")).sum
    assert(math.abs(totalW - 1.0) < 1e-4)
  }

  test("equal losses reduce to the pure sqrt-temperature baseline (smoothed)") {
    import spark.implicits._
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b")).toDF("doc_id", "source")
    val loss = Seq(1L -> 3000000L, 2L -> 3000000L, 3L -> 3000000L, 4L -> 3000000L)
      .toDF("doc_id", "loss_e6")
    val got = Doremi.weights(docs, loss).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.values.forall(_.getAs[Long]("excess_e6") === 0L))
    // pexp(0) = 1 → w ∝ sqrt(n/tn): sqrt(3/4) vs sqrt(1/4) → 0.75/0.25
    // weight ratio before smoothing = sqrt(3) : 1
    val wa = got("a").getAs[Long]("w_e6").toDouble
    val wb = got("b").getAs[Long]("w_e6").toDouble
    assert(math.abs(wa / wb - math.sqrt(3.0)) < 1e-5)
  }

  test("epoch trajectory: moving baseline, mass conserved, hard domain stays up-weighted") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a"), (2L, "a"), (3L, "a"), (4L, "a"), (5L, "b"), (6L, "b")
    ).toDF("doc_id", "source")
    val loss = Seq(
      1L -> 2000000L, 2L -> 1500000L, 3L -> 2500000L, 4L -> 2000000L,
      5L -> 5000000L, 6L -> 5000000L
    ).toDF("doc_id", "loss_e6")
    val got = Doremi.epochWeights(docs, loss, epochs = 3)
      .as[(String, Long, Long, Int, Long)].collect()
    assert(got.length === 6) // 2 sources × 3 epochs
    // per-epoch mass ≈ 1 (e6), within per-source rounding
    (1 to 3).foreach { t =>
      val mass = got.filter(_._4 == t).map(_._5).sum
      assert(math.abs(mass - 1000000L) <= 2L, s"epoch $t mass $mass")
    }
    // the hard domain (b, mean 5.0 vs corpus 3.0) beats uniform every epoch
    got.filter(r => r._1 == "b").foreach(r => assert(r._5 > 500000L, r))
    // moving baseline bites: epoch-2 α differs from epoch-1 (the baseline
    // rose once b was up-weighted, shrinking b's excess)
    val b1 = got.find(r => r._1 == "b" && r._4 == 1).get._5
    val b2 = got.find(r => r._1 == "b" && r._4 == 2).get._5
    assert(b1 !== b2)
    assert(b2 < b1, "higher baseline must shrink the boost")
  }

  test("equal losses: every epoch is exactly uniform") {
    import spark.implicits._
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("doc_id", "source")
    val loss = Seq(1L -> 3000000L, 2L -> 3000000L, 3L -> 3000000L, 4L -> 3000000L)
      .toDF("doc_id", "loss_e6")
    val got = Doremi.epochWeights(docs, loss, epochs = 3)
      .as[(String, Long, Long, Int, Long)].collect()
    assert(got.forall(_._5 === 250000L), got.mkString(", "))
  }
}
