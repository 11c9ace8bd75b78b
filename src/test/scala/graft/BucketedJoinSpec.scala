package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.BucketedJoin
import graft.sources.Tables

class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucket layout removes BOTH exchanges under the merge join") {
    val t = Tables(spark, TestSpark.Sf0001)
    val df = BucketedJoin.segmentRevenue(spark, t.orders, t.customer)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), s"merge hint must hold, plan:\n$p")
    // exactly ONE exchange total: the post-join segment rollup. The join
    // inputs read bucketed scans — no hashpartitioning on custkey.
    val joinSubtree = p.substring(p.indexOf("SortMergeJoin"))
    assert(!joinSubtree.contains("Exchange hashpartitioning"),
      s"bucketed join inputs must not shuffle, plan:\n$p")
    assert(p.contains("SelectedBucketsCount") || p.contains("Bucketed: true"),
      s"scans must carry the bucket spec, plan:\n$p")
  }

  test("equality on the bucket key scans one bucket of eight") {
    val t = Tables(spark, TestSpark.Sf0001)
    val df = BucketedJoin.prunedLookup(spark, t.customer, custkey = 7L)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("SelectedBucketsCount: 1 out of 8"),
      s"bucket pruning must select one bucket, plan:\n$p")
    assert(df.count() == 1L)
  }

  test("result matches the plain (shuffled) join bit-for-bit") {
    val t = Tables(spark, TestSpark.Sf0001)
    val bucketed = BucketedJoin.segmentRevenue(spark, t.orders, t.customer)
      .orderBy("c_mktsegment").collect().toSeq
    val (o, c) = (t.orders, t.customer)
    val plain = o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        graft.functions.Money.moneySum(col("o_totalprice")).as("revenue"))
      .orderBy("c_mktsegment").collect().toSeq
    assert(bucketed == plain)
  }
}
