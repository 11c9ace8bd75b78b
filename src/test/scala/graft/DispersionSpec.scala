package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dispersion

/** Fano factor vs closed forms on constructed hourly series. */
final class DispersionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def events(rows: Seq[(String, Long)]) = {
    import spark.implicits._
    rows.toDF("event_type", "s").select(col("event_type"),
      timestamp_seconds(col("s")).as("ts"))
  }

  test("metronomic type has Fano 0; global grid zero-fills the other type") {
    val h = 3600L
    // type a: exactly 2/hour over hours 0..3 → mean 2, var 0, fano 0
    // type b: 4 events all in hour 0; dense over global grid 0..3 →
    //   series (4,0,0,0): mean 1, var = (16/4 − 1) = 3, fano 3
    val rows =
      (0L to 3L).flatMap(k => Seq(("a", k * h), ("a", k * h + 1))) ++
        Seq(("b", 10L), ("b", 20L), ("b", 30L), ("b", 40L))
    val got = Dispersion.fanoByType(events(rows)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(got("a") === ((4L, 2.0, 0.0)))
    assert(got("b") === ((4L, 1.0, 3.0)))
  }
}
