package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.HoltWinters

/** Hand-traced Holt–Winters recursion on a constructed daily series, the
  * short-series drop contract, forecast seasonality, and determinism.
  */
final class HoltWintersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** One event per (type, day) with the given value — day d of 2024-01. */
  private def events(rows: (String, Int, Double)*) =
    rows.toDF("event_type", "d", "value")
      .select(col("event_type"),
        to_timestamp(format_string("2024-01-%02d 12:00:00", col("d"))).as("ts"),
        col("value"))

  test("constant series: level locks to the constant, trend 0, perfect fit") {
    val ev = events((1 to 15).map(d => ("a", d, 5.0)): _*)
    val out = HoltWinters.fit(spark, ev).collect()
    val fits = out.filter(_.getString(2) == "fit")
    assert(fits.length === 8) // days 8..15
    // y = 5_000_000 micros; s_i = 0, l = 5e6, b = 0 forever -> fitted = y
    assert(fits.forall(r => r.getLong(4) === 5000000L))
    assert(fits.forall(r => r.getLong(5) === 5000000L && r.getLong(6) === 0L))
    val fc = out.filter(_.getString(2) == "forecast")
    assert(fc.length === 7)
    assert(fc.forall(r => r.getLong(4) === 5000000L))
    assert(fc.forall(r => r.isNullAt(3)))
  }

  test("hand-traced first update on a seasonal step series") {
    // week 1: 1,1,1,1,1,1,8 (sum 14e6 micros); day 8 value 1.
    // l0 = trunc(14e6/7) = 2000000; s_i = y_i - l0, so s1 = -1000000
    // t=8: fitted = l0 + 0 + s1 = 1000000
    //   lNew = trunc((2*(1e6 - (-1e6)) + 8*2e6)/10) = trunc(20e6/10) = 2000000
    //   bNew = trunc((0 + 0)/10) = 0
    val ev = events((Seq(1, 1, 1, 1, 1, 1, 8).zipWithIndex.map {
      case (v, i) => ("a", i + 1, v.toDouble)
    } :+ (("a", 8, 1.0))): _*)
    val r = HoltWinters.fit(spark, ev).where(col("kind") === "fit").collect().head
    assert(r.getLong(1) === 8L)
    assert(r.getLong(4) === 1000000L) // fitted
    assert(r.getLong(5) === 2000000L) // level
    assert(r.getLong(6) === 0L)       // trend
  }

  test("types with fewer than m+1 observed days are dropped") {
    val ev = events(((1 to 7).map(d => ("short", d, 1.0)) ++
      (1 to 9).map(d => ("long", d, 1.0))): _*)
    val types = HoltWinters.fit(spark, ev).select("event_type")
      .distinct().as[String].collect().toSet
    assert(types === Set("long"))
  }

  test("forecast rows carry the rotating seasonal slots") {
    // strongly weekly series over 3 weeks: spike every 7th day
    val ev = events((1 to 21).map(d =>
      ("a", d, if (d % 7 == 0) 10.0 else 1.0)): _*)
    val fc = HoltWinters.fit(spark, ev).where(col("kind") === "forecast")
      .orderBy("idx").collect()
    assert(fc.length === 7)
    // the spike slot (7th forecast day = idx 28, a multiple of 7) must be
    // the maximum of the forecast week
    val preds = fc.map(r => r.getLong(1) -> r.getLong(4))
    val spike = preds.find(_._1 === 28L).get._2
    assert(preds.forall { case (_, p) => p <= spike })
  }

  test("MASE: perfect fit on a constant series scores 0; sums match fits") {
    val ev = events((1 to 15).map(d => ("a", d, 5.0)): _*)
    val r = HoltWinters.mase(spark, ev).collect().head
    assert(r.getLong(1) === 8L)       // n_fit = days 8..15
    assert(r.getLong(2) === 0L)       // sae: perfect fit
    assert(r.getLong(3) === 0L)       // snaive: constant series
    assert(r.getLong(4) === 0L)       // 0/0 convention
    // cross-check against the fit rows on a non-trivial series
    val ev2 = events((1 to 20).map(d => ("a", d, (d % 5 + 1).toDouble)): _*)
    val fits = HoltWinters.fit(spark, ev2)
      .where(col("kind") === "fit")
      .select(abs(col("y_micros") - col("pred_micros"))).as[Long].collect().sum
    assert(HoltWinters.mase(spark, ev2).collect().head.getLong(2) === fits)
  }

  test("fit is deterministic across invocations") {
    val ev = events((1 to 20).map(d => ("a", d, (d % 5 + 1).toDouble)): _*)
    val a = HoltWinters.fit(spark, ev).collect().map(_.toString).sorted.toSeq
    val b = HoltWinters.fit(spark, ev).collect().map(_.toString).sorted.toSeq
    assert(a === b)
  }
}
