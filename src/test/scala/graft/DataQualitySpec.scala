package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DataQuality

/** Constructed-frame units for the Deequ-style constraint report: exact
  * violation counts per constraint class, null child keys exempt from FK,
  * and the one-scan plan shape for the predicate battery.
  */
final class DataQualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val frame = Seq(
    (1L, Some(10L), "a", 5.0),
    (2L, None, "a", -1.0),     // null key + negative value
    (2L, Some(11L), "b", 0.0), // duplicate id
    (3L, Some(99L), "zz", 2.0) // out-of-domain category
  ).toDF("id", "ref", "cat", "v")

  test("per-constraint violation counts and verdicts") {
    val got = DataQuality.finish(DataQuality.report(
      frame,
      Seq(
        "complete_ref" -> $"ref".isNull,
        "v_nonneg" -> ($"v" < 0.0),
        "cat_domain" -> !$"cat".isin("a", "b")),
      uniqueCols = Seq("id")))
      .as[(String, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("complete_ref") === (("complete_ref", 1L, 4L, 250000L, false)))
    assert(got("v_nonneg") === (("v_nonneg", 1L, 4L, 250000L, false)))
    assert(got("cat_domain") === (("cat_domain", 1L, 4L, 250000L, false)))
    assert(got("unique_id") === (("unique_id", 1L, 4L, 250000L, false)))
  }

  test("FK check: unmatched non-null keys counted, nulls exempt") {
    val parent = Seq(10L, 11L).toDF("pk")
    val got = DataQuality.finish(
      DataQuality.fkViolations(frame, "ref", parent, "pk", "fk_ref"))
      .as[(String, Long, Long, Long, Boolean)].head()
    // 99 is the only non-null unmatched ref; the None row doesn't count
    assert(got === (("fk_ref", 1L, 4L, 250000L, false)))
  }

  test("all-clean frame passes everything") {
    val got = DataQuality.finish(DataQuality.report(
      frame.filter($"id" === 1L), Seq("v_nonneg" -> ($"v" < 0.0)), Seq("id")))
      .as[(String, Long, Long, Long, Boolean)].collect()
    assert(got.forall(_._5))
    assert(got.forall(_._2 == 0L))
  }

  test("empty frame reports zeros instead of tripping ANSI divide-by-zero") {
    val got = DataQuality.finish(DataQuality.report(
      frame.filter($"id" === 99L), Seq("v_nonneg" -> ($"v" < 0.0)), Seq("id")))
      .as[(String, Long, Long, Long, Boolean)].collect()
    assert(got.length === 2)
    assert(got.forall(r => r._2 == 0L && r._3 == 0L && r._4 == 0L && r._5))
    val fk = DataQuality.finish(DataQuality.fkViolations(
      frame.filter($"id" === 99L), "ref", Seq(1L).toDF("pk"), "pk", "fk"))
      .as[(String, Long, Long, Long, Boolean)].head()
    assert(fk === (("fk", 0L, 0L, 0L, true)))
  }

  test("dotted constraint names fail fast with a clear message") {
    val e = intercept[IllegalArgumentException] {
      DataQuality.report(frame, Seq("value.range" -> ($"v" < 0.0)))
    }
    assert(e.getMessage.contains("value.range"))
  }

  test("the predicate battery is a single aggregation pass") {
    val plan = DataQuality.report(
      frame,
      Seq("complete_ref" -> $"ref".isNull, "v_nonneg" -> ($"v" < 0.0)),
      uniqueCols = Seq("id"))
      .queryExecution.optimizedPlan.toString
    // one Aggregate chain over one scan — no union of per-check scans
    assert(plan.split("LocalRelation|LogicalRDD").length <= 2, plan)
  }
}
