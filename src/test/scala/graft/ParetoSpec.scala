package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pareto

/** Pareto revenue shares vs hand-computed cumulative fractions. */
final class ParetoSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("hand-computed shares on 10 users") {
    import spark.implicits._
    // user u spends u dollars (u = 1..10); total 55.
    // DESC ranks: 10,9,8,...  top-10% → 1 user (10) → share 10/55
    // top-20% → 2 users (10+9=19) → 19/55
    val df = (1L to 10L).map(u => (u, "purchase", u.toDouble))
      .toDF("user_id", "event_type", "value")
    val got = Pareto.revenueShares(spark, df, Seq(10L, 20L)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(got(10L) === ((1L, 10.0, math.floor(10.0 / 55.0 * 1e6 + 0.5) / 1e6)))
    assert(got(20L) === ((2L, 19.0, math.floor(19.0 / 55.0 * 1e6 + 0.5) / 1e6)))
  }

  test("tiny populations clamp the head to one user") {
    import spark.implicits._
    val df = Seq((1L, "purchase", 4.0), (2L, "purchase", 1.0))
      .toDF("user_id", "event_type", "value")
    val got = Pareto.revenueShares(spark, df, Seq(1L)).collect()
    assert(got.length === 1)
    assert(got.head.getLong(1) === 1L)
    assert(got.head.getDouble(3) === 0.8)
  }
}
