package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{HllReplay, IncrementalAgg}
import graft.sources.Tables

/** Incremental state merge: merge ≡ recompute exactly (scalars and HLL
  * registers), one-sided groups pass through, and the merged estimate
  * equals the direct single-pass sketch.
  */
final class IncrementalAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val events = Tables(spark, TestSpark.Sf0001).events
    .where(col("value").isNotNull)
    .select(col("event_type"),
      expr("CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)").as("v"),
      col("user_id"),
      expr("(ts_ns DIV 1000) DIV 86400000000").as("day"))

  test("merged scalar state equals recompute-from-scratch exactly") {
    val old = events.filter(pmod(col("day"), lit(2)) === 0)
    val delta = events.filter(pmod(col("day"), lit(2)) === 1)
    val merged = IncrementalAgg.mergeScalarStates(
      IncrementalAgg.scalarState(old, "event_type", "v"),
      IncrementalAgg.scalarState(delta, "event_type", "v"))
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val direct = IncrementalAgg.scalarState(events, "event_type", "v")
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(merged === direct)
  }

  test("merged register state equals the direct register table exactly") {
    val old = events.filter(pmod(col("day"), lit(2)) === 0)
    val delta = events.filter(pmod(col("day"), lit(2)) === 1)
    val merged = IncrementalAgg.mergeRegisterStates(
      HllReplay.registers(old, "user_id", "event_type"),
      HllReplay.registers(delta, "user_id", "event_type"))
      .as[(String, Long, Long)].collect().sortBy(t => (t._1, t._2)).toSeq
    val direct = HllReplay.registers(events, "user_id", "event_type")
      .as[(String, Long, Long)].collect().sortBy(t => (t._1, t._2)).toSeq
    assert(merged === direct && merged.nonEmpty)
  }

  test("groups present in only one half survive the merge unchanged") {
    val old = Seq(("a", 10L), ("a", 20L)).toDF("g", "v")
    val delta = Seq(("b", 5L)).toDF("g", "v")
    val merged = IncrementalAgg.mergeScalarStates(
      IncrementalAgg.scalarState(old, "g", "v"),
      IncrementalAgg.scalarState(delta, "g", "v"))
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(merged === Seq(("a", 2L, 30L, 10L, 20L), ("b", 1L, 5L, 5L, 5L)))
  }

  test("end-to-end mergedStats carries a sane distinct estimate") {
    val old = events.filter(pmod(col("day"), lit(2)) === 0)
    val delta = events.filter(pmod(col("day"), lit(2)) === 1)
    val out = IncrementalAgg.mergedStats(old, delta, "event_type", "v", "user_id")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    val exact = events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("d"))
      .as[(String, Long)].collect().toMap
    out.foreach { case (g, n, _, mn, mx, nz, estE6) =>
      assert(n > 0 && mn <= mx && nz >= 1 && nz <= 64)
      val est = estE6 / 1e6
      val ex = exact(g).toDouble
      // m=64 HLL standard error ~13%; generous 3-sigma corridor
      assert(est > ex * 0.6 && est < ex * 1.4, s"$g est $est vs exact $ex")
    }
  }
}
