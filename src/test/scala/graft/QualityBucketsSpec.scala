package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{LmScore, QualityBuckets}
import graft.sources.Tables

class QualityBucketsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("byNtile: per-group tiers with standard remainder semantics") {
    // group g has 7 rows → bucket sizes 3,2,2; group h has 3 rows → 1,1,1
    val df = ((1 to 7).map(i => ("g", i.toLong, i * 1.0)) ++
      (1 to 3).map(i => ("h", (i + 10).toLong, i * 1.0))).toDF("lang", "doc_id", "score")
    val got = QualityBuckets.byNtile(df, n = 3, scoreCol = "score")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(3)).toMap
    assert((1 to 7).map(i => got(("g", i.toLong))) == Seq(1, 1, 1, 2, 2, 3, 3))
    assert((1 to 3).map(i => got(("h", (i + 10).toLong))) == Seq(1, 2, 3))
  }

  test("byNtile: equal scores order by id — deterministic") {
    val df = Seq(("g", 2L, 5.0), ("g", 1L, 5.0), ("g", 3L, 5.0), ("g", 4L, 9.0))
      .toDF("lang", "doc_id", "score")
    val got = QualityBuckets.byNtile(df, n = 2, scoreCol = "score")
      .collect().map(r => r.getLong(1) -> r.getInt(3)).toMap
    assert(got == Map(1L -> 1, 2L -> 1, 3L -> 2, 4L -> 2))
  }

  test("byApproxThresholds: near-even tiers, monotone in score") {
    val docs = Tables(spark, TestSpark.Sf001).documents
    val scored = LmScore.score(docs, docs)
    val b = QualityBuckets.byApproxThresholds(scored, n = 3)
    val sizes = b.groupBy($"bucket").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = sizes.values.sum.toDouble
    assert(sizes.keySet == Set(1, 2, 3))
    sizes.values.foreach(s => assert(math.abs(s / total - 1.0 / 3) < 0.05,
      s"tier sizes $sizes not near-even"))
    // monotone: every bucket-1 score <= every bucket-3 score
    val max1 = b.filter($"bucket" === 1).agg(max($"avg_logp")).collect()(0).getDouble(0)
    val min3 = b.filter($"bucket" === 3).agg(min($"avg_logp")).collect()(0).getDouble(0)
    assert(max1 <= min3)
  }

  test("byApproxThresholds plan: bucketing is a zero-shuffle projection") {
    val scored = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)).toDF("doc_id", "avg_logp")
    val p = QualityBuckets.byApproxThresholds(scored, n = 3)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"threshold bucketing must not shuffle:\n$p")
  }
}
