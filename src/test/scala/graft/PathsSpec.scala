package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Paths

/** Event trigram mining vs hand-enumerated sequences. */
final class PathsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def events(rows: Seq[(Long, String, Long)]) = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((u, e, s), i) => (i.toLong, u, e, s) }
      .toDF("event_id", "user_id", "event_type", "s")
      .select(col("event_id"), col("user_id"), col("event_type"),
        (col("s") * lit(1000000000L)).as("ts_ns"))
  }

  test("hand-enumerated trigrams with per-user boundaries") {
    // u1: a b c d → (a,b,c), (b,c,d); u2: a b c → (a,b,c)
    val df = events(Seq(
      (1L, "a", 10L), (1L, "b", 20L), (1L, "c", 30L), (1L, "d", 40L),
      (2L, "a", 10L), (2L, "b", 20L), (2L, "c", 30L)))
    val got = Paths.eventTrigrams(df, minCount = 1L).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    assert(got === Map(("a", "b", "c") -> 2L, ("b", "c", "d") -> 1L))
  }

  test("timestamp ties break on event_id") {
    // same ts: order fixed by event_id insertion order → x y z
    val df = events(Seq((1L, "x", 5L), (1L, "y", 5L), (1L, "z", 5L)))
    val got = Paths.eventTrigrams(df, minCount = 1L).collect()
    assert(got.length === 1)
    assert((got.head.getString(0), got.head.getString(1), got.head.getString(2)) ===
      (("x", "y", "z")))
  }
}
