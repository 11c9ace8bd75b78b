package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ewma

/** Hand-traced integer-EWMA recurrences: exact micro states, negative-Δ
  * flooring, constant-series fixpoint, and global-grid zero-fill.
  */
final class EwmaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def events(rows: Seq[(String, Long)]) = {
    import spark.implicits._
    rows.toDF("event_type", "s").select(col("event_type"),
      timestamp_seconds(col("s")).as("ts"))
  }

  /** n events of `tpe` in bucket k (bucket width 10 s in these tests;
    * timestamps wrap within the bucket so any n stays inside it).
    */
  private def bucket(tpe: String, k: Long, n: Int): Seq[(String, Long)] =
    (0 until n).map(i => (tpe, k * 10L + (i % 10)))

  private def run(rows: Seq[(String, Long)], shift: Int = 3): Map[(String, Long), (Long, Long)] =
    Ewma.bucketEwma(events(rows), bucketSeconds = 10L, shift = shift)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap

  test("hand trace: counts (8, 0, 16) with α = 1/8") {
    // s1 = 8e6; s2 = 8e6 + floor(−8e6/8) = 7e6 (negative Δ floors
    // exactly); s3 = 7e6 + floor(9e6/8) = 8_125_000
    val got = run(bucket("a", 0, 8) ++ bucket("a", 2, 16))
    assert(got(("a", 0L)) === ((8L, 8000000L)))
    assert(got(("a", 10L)) === ((0L, 7000000L)))
    assert(got(("a", 20L)) === ((16L, 8125000L)))
  }

  test("non-divisible negative delta floors toward -inf") {
    // counts (3, 1): s2 = 3e6 + floor(−2e6/8) = 2_750_000
    val got = run(bucket("b", 0, 3) ++ bucket("b", 1, 1))
    assert(got(("b", 10L)) === ((1L, 2750000L)))
  }

  test("constant series is a fixpoint; other type zero-fills on the global grid") {
    val rows = bucket("c", 0, 5) ++ bucket("c", 1, 5) ++ bucket("c", 2, 5) ++
      bucket("d", 2, 8)
    val got = run(rows)
    assert(got(("c", 0L))._2 === 5000000L)
    assert(got(("c", 10L))._2 === 5000000L)
    assert(got(("c", 20L))._2 === 5000000L)
    // d starts at the grid origin with x = 0 → s = 0 until its burst
    assert(got(("d", 0L)) === ((0L, 0L)))
    assert(got(("d", 10L)) === ((0L, 0L)))
    assert(got(("d", 20L)) === ((8L, 1000000L)))
  }

  test("ewma column is exactly micros / 1e6") {
    val out = Ewma.bucketEwma(events(bucket("e", 0, 7)), bucketSeconds = 10L)
      .collect()
    out.foreach(r => assert(r.getDouble(4) === r.getLong(3).toDouble / 1e6))
  }
}
