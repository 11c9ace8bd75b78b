package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Concentration

/** Gini of per-user purchase spend vs hand-computed closed forms. */
final class ConcentrationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def events(rows: Seq[(Long, String, Double)]) = {
    import spark.implicits._
    rows.toDF("user_id", "event_type", "value")
      .withColumn("ts", timestamp_seconds(lit(1000L)))
  }

  test("hand-computed Gini on spends 1,2,3,4") {
    // x = (1,2,3,4): G = 2*(1*1+2*2+3*3+4*4)/(4*10) - 5/4 = 0.25
    val df = events(Seq(
      (1L, "purchase", 1.0), (2L, "purchase", 2.0),
      (3L, "purchase", 3.0), (4L, "purchase", 4.0),
      (5L, "view", 99.0)))
    val r = Concentration.spendGini(df).collect().head
    assert(r.getLong(0) === 4L)
    assert(r.getDouble(1) === 10.0)
    assert(r.getDouble(2) === 0.25)
  }

  test("perfect equality gives Gini 0") {
    val df = events((1L to 5L).map(u => (u, "purchase", 2.0)))
    val r = Concentration.spendGini(df).collect().head
    assert(r.getDouble(2) === 0.0)
  }

  test("tied spends: rank permutation does not change the value") {
    // (1,1,4): G = 2*(1+2+12)/(3*6) - 4/3 = 30/18 - 4/3 = 1/3
    val df = events(Seq(
      (7L, "purchase", 1.0), (3L, "purchase", 1.0), (5L, "purchase", 4.0)))
    val r = Concentration.spendGini(df).collect().head
    assert(math.abs(r.getDouble(2) - 1.0 / 3.0) < 1e-6)
  }
}
