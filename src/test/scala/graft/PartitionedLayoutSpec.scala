package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.PartitionedLayout
import graft.sources.Tables

class PartitionedLayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("the filter becomes a PartitionFilter — no data filter, no other partitions") {
    val ev = Tables(spark, TestSpark.Sf0001).events
      .select(col("event_id"), col("user_id"), col("value"), col("event_type"))
    val df = PartitionedLayout.prunedAgg(spark, ev, "event_type", "purchase")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(event_type"),
      s"equality on the partition column must prune directories, plan:\n$p")
    assert(p.contains("= purchase)"), s"plan:\n$p")
    assert(p.contains("PushedFilters: []"),
      s"nothing should remain for row-level filtering, plan:\n$p")
  }

  test("result matches the unpartitioned aggregate") {
    val ev = Tables(spark, TestSpark.Sf0001).events
      .select(col("event_id"), col("user_id"), col("value"), col("event_type"))
    val got = PartitionedLayout.prunedAgg(spark, ev, "event_type", "purchase")
      .collect().head
    val want = ev.filter(col("event_type") === "purchase")
      .agg(count(lit(1)), countDistinct(col("user_id")),
        sum(floor(col("value") * lit(1000000.0) + lit(0.5)).cast("long")))
      .collect().head
    assert(got.getLong(1) == want.getLong(0))
    assert(got.getLong(2) == want.getLong(1))
    assert(got.getLong(3) == want.getLong(2))
  }
}
