package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CurationLedger

/** One constructed document per drop reason; flags are independent and the
  * keep bit is their conjunction.
  */
final class CurationLedgerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // 58 distinct words + two Gopher stops: passes A1.1 (count/len/alpha/
  // stops) AND A1.2 (no repeated n-grams anywhere)
  private val good =
    ((1 to 58).map(i => s"alpha$i") ++ Seq("the", "of")).mkString(" ")
  private val benchText =
    "spark is a fast engine for big data processing today"

  private def run(rows: Seq[(Long, String)]): Map[Long, (Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)] = {
    import spark.implicits._
    CurationLedger.ledger(rows.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2), r.getBoolean(3),
        r.getBoolean(4), r.getBoolean(5), r.getBoolean(6))))
      .toMap
  }

  test("each stage flags independently; keep is the conjunction") {
    val rows = Seq(
      1L -> good,              // keeper of the dup pair → keep
      2L -> good,              // exact dup of 1 → dropped as dup only
      3L -> benchText,         // shares shingles with bench doc 20 → contaminated
      4L -> "too short",       // fails quality gates
      20L -> benchText)        // bench partition
    val got = run(rows)
    // (is_bench, g_quality, g_repetition, is_exact_dup, is_contaminated, keep)
    assert(got(1L) === ((false, true, true, false, false, true)))
    assert(got(2L) === ((false, true, true, true, false, false)))
    assert(got(3L)._1 === false)
    assert(got(3L)._5 === true, s"doc 3 must be contaminated: ${got(3L)}")
    assert(got(3L)._6 === false)
    assert(got(4L)._2 === false)
    assert(got(4L)._6 === false)
    assert(got(20L)._1 === true)
    assert(got(20L)._6 === false)
  }

  test("waterfall attributes each doc to its first failing stage") {
    import spark.implicits._
    val rows = Seq(
      1L -> good, 2L -> good, 3L -> benchText, 4L -> "too short",
      20L -> benchText)
    val wf = CurationLedger.waterfall(rows.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(wf("bench_holdout") === ((5L, 1L, 4L)))
    assert(wf("quality_gates") === ((4L, 2L, 2L)))   // docs 3 and 4 fail A1.1
    assert(wf("repetition_gates") === ((2L, 0L, 2L)))
    assert(wf("exact_dedup") === ((2L, 1L, 1L)))      // doc 2
    assert(wf("decontamination") === ((1L, 0L, 1L)))  // doc 3 already dropped
  }

  test("fixture ledger is complete and consistent with the stage queries") {
    import org.apache.spark.sql.functions._
    val docs = sources.Tables(spark, "/root/testdata/sf0.001").documents
    val led = CurationLedger.ledger(docs).cache()
    assert(led.count() === docs.count())
    val contaminated = led.filter(col("is_contaminated")).count()
    val viaStage = graft.operators.Decontaminate.overlaps(
      docs.filter(pmod(col("doc_id"), lit(20)) =!= 0),
      docs.filter(pmod(col("doc_id"), lit(20)) === 0), minShared = 2)
      .select(col("doc_id")).distinct().count()
    assert(contaminated === viaStage)
    led.unpersist()
  }
}
