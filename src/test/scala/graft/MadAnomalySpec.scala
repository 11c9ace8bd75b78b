package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.MadAnomaly

class MadAnomalySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // one event row per (type, day, i) — counts per day via repetition
  private def events(counts: Map[(String, Long), Int]) = {
    val rows = counts.toSeq.flatMap { case ((t, day), n) =>
      (1 to n).map(i => (t, new java.sql.Timestamp(day * 86400000L + i * 1000L)))
    }
    rows.toDF("event_type", "ts")
  }

  test("hand-traced Hampel flags; the spike a z-score would mask is caught") {
    // A: [10, 10, 10, 100] -> med_x2 = 20, devs_x2 [0,0,0,180], mad_x2 = 0
    // (z-score context: mean 32.5, std ~45 -> z(100) = 1.5, NOT flagged)
    val df = MadAnomaly.dailyOutliers(events(Map(
      ("A", 1L) -> 10, ("A", 2L) -> 10, ("A", 3L) -> 10, ("A", 4L) -> 100)))
      .collect().map(r => r.getLong(1) -> r).toMap
    assert(df(1L).getDouble(3) == 20.0 && df(1L).getDouble(4) == 0.0)
    assert(!df(1L).getBoolean(6) && !df(2L).getBoolean(6) && !df(3L).getBoolean(6))
    assert(df(4L).getBoolean(6), "the 10x spike must flag")
  }

  test("even-count median interpolates on the exact dyadic grid") {
    // B: [10, 20] -> med_x2 = (20+40)/2 = 30 exactly; devs_x2 = [10, 10],
    // mad_x2 = 10; neither day beats 3*MAD
    val df = MadAnomaly.dailyOutliers(events(Map(("B", 1L) -> 10, ("B", 2L) -> 20)))
      .collect()
    assert(df.forall(_.getDouble(3) == 30.0))
    assert(df.forall(_.getDouble(4) == 10.0))
    assert(df.forall(!_.getBoolean(6)))
  }

  test("a wobbly-but-unexceptional series stays quiet") {
    // C: [10, 12, 14, 16, 18] -> med_x2 = 28, devs_x2 [8,4,0,4,8],
    // mad_x2 = 4 -> threshold 12: the extreme days (8) stay inside
    val df = MadAnomaly.dailyOutliers(events(Map(
      ("C", 1L) -> 10, ("C", 2L) -> 12, ("C", 3L) -> 14,
      ("C", 4L) -> 16, ("C", 5L) -> 18))).collect()
    assert(df.forall(!_.getBoolean(6)))
  }
}
