package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Cusum

/** CUSUM closed form vs the textbook recursion on hand-built series, the
  * zero-floor property, and alarm behavior on a planted level shift.
  */
final class CusumSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def events(rows: (String, Int, Double)*) =
    rows.toDF("event_type", "d", "value")
      .select(col("event_type"),
        to_timestamp(format_string("2024-01-%02d 12:00:00", col("d"))).as("ts"),
        col("value"))

  /** Textbook recursion in micros for one type's daily values. */
  private def naive(y: Seq[Long]): Seq[(Long, Long)] = {
    val mu = y.take(Cusum.RefDays).sum / Cusum.RefDays
    val kappa = mu / 20
    var sp = 0L
    var sm = 0L
    y.map { v =>
      sp = math.max(0L, sp + (v - mu - kappa))
      sm = math.max(0L, sm + (mu - v - kappa))
      (sp, sm)
    }
  }

  test("window closed form equals the textbook max(0, ...) recursion") {
    val vals = Seq(5.0, 6.0, 4.0, 5.0, 7.0, 3.0, 5.0, 9.0, 9.5, 2.0, 5.0, 8.5)
    val ev = events(vals.zipWithIndex.map { case (v, i) => ("a", i + 1, v) }: _*)
    val got = Cusum.chart(ev).orderBy("idx").collect()
      .map(r => (r.getLong(4), r.getLong(5)))
    val want = naive(vals.map(v => math.round(v * 1e6)))
    assert(got.toSeq === want)
  }

  test("in-control series never alarms; a sustained level shift does") {
    // week at 5.0 then a jump to 9.0 (80% above the reference mean):
    // drift accumulates past h = mu/4 within a few shifted days
    val shifted = (1 to 7).map(d => ("a", d, 5.0)) ++
      (8 to 14).map(d => ("a", d, 9.0))
    val flat = (1 to 14).map(d => ("b", d, 5.0))
    val out = Cusum.chart(events((shifted ++ flat): _*)).collect()
    val byType = out.groupBy(_.getString(0))
    assert(byType("b").forall(!_.getBoolean(6)), "flat series must not alarm")
    assert(byType("a").exists(_.getBoolean(6)), "shifted series must alarm")
    // S never goes negative (the zero floor)
    assert(out.forall(r => r.getLong(4) >= 0L && r.getLong(5) >= 0L))
  }

  test("types with fewer than RefDays observed days are dropped, not mis-referenced") {
    // 2 flat days: a full reference week doesn't exist — mu would be the
    // 2-day sum DIV 7 (~29% of the true mean) and the flat series would
    // alarm immediately; the gate drops the type instead
    val ev = events((1 to 2).map(d => ("short", d, 7.0)) ++
      (1 to 10).map(d => ("long", d, 7.0)): _*)
    val types = Cusum.chart(ev).select("event_type").distinct()
      .collect().map(_.getString(0)).toSet
    assert(types === Set("long"))
  }

  test("downward shifts fire the S-minus side") {
    val ev = events(((1 to 7).map(d => ("a", d, 8.0)) ++
      (8 to 14).map(d => ("a", d, 1.0))): _*)
    val alarms = Cusum.chart(ev).where(col("alarm")).collect()
    assert(alarms.nonEmpty)
    assert(alarms.forall(r => r.getLong(5) > r.getLong(4)),
      "the minus-side statistic must carry the downward alarm")
  }
}
