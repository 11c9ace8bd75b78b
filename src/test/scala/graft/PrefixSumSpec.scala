package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PrefixSum

class PrefixSumSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val rows = {
    val rnd = new scala.util.Random(11)
    (1 to 5000).map(i => (i.toLong, rnd.nextInt(100).toLong)).toDF("k", "v")
  }

  test("matches the single-partition global window exactly") {
    val naive = rows.withColumn("rt",
      sum($"v").over(Window.orderBy($"k").rowsBetween(Window.unboundedPreceding, 0)))
      .select($"k", $"rt").as[(Long, Long)].collect().toMap
    val got = PrefixSum.runningTotal(rows.repartition(13), Seq("k"), "v", numPartitions = 7)
      .select($"k", $"running_total").as[(Long, Long)].collect().toMap
    assert(got == naive)
  }

  test("output independent of partition count") {
    val a = PrefixSum.runningTotal(rows, Seq("k"), "v", numPartitions = 1)
      .select($"k", $"running_total").as[(Long, Long)].collect().toSet
    val b = PrefixSum.runningTotal(rows.repartition(31), Seq("k"), "v", numPartitions = 17)
      .select($"k", $"running_total").as[(Long, Long)].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("budgetShards: start-offset assignment, contiguous non-decreasing shard ids") {
    val got = PrefixSum.budgetShards(rows, Seq("k"), "v", budget = 1000L, numPartitions = 5)
      .select($"k", $"v", $"running_total", $"shard")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    got.foreach { case (k, v, rt, s) =>
      assert(s == (rt - v) / 1000L, s"row $k")
    }
    val shards = got.map(_._4)
    assert(shards.zip(shards.tail).forall { case (x, y) => x <= y })
    assert(shards.distinct.sorted.sameElements(0L to shards.max))
  }

  test("constant-1 runningTotal over a PERSISTED input equals global row_number") {
    // Regression (r13): over a cached input the offsets branch and the main
    // branch each re-sampled their own range boundaries (ReuseExchange does
    // not fire across an InMemoryRelation), drifting ranks by up to the
    // partition skew — caught by the q_dsir_scores sf0.1 gate. The persist
    // inside runningTotal pins one materialized partitioning for both.
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(7)
    val df = (1 to 5000).map(i => (i.toLong, rnd.nextInt(100000).toLong))
      .toDF("id", "score")
      .repartition(8)
      .withColumn("_negscore", -$"score")
      .withColumn("_one", org.apache.spark.sql.functions.lit(1L))
      .persist()
    df.count()
    try {
      val ranked = PrefixSum.runningTotal(df, Seq("_negscore", "id"), "_one", "_rk")
        .select($"id", $"_rk").as[(Long, Long)].collect().toMap
      val truth = df
        .withColumn("_rk",
          org.apache.spark.sql.functions.row_number()
            .over(Window.orderBy($"_negscore", $"id")).cast("long"))
        .select($"id", $"_rk").as[(Long, Long)].collect().toMap
      val bad = truth.collect { case (id, rk) if ranked(id) != rk => (id, rk, ranked(id)) }
      assert(bad.isEmpty, s"first mismatches: ${bad.take(5)}")
    } finally df.unpersist()
  }

  test("full input flows through a range exchange and a _pid window, never one task") {
    val p = PrefixSum.runningTotal(rows, Seq("k"), "v", numPartitions = 7)
      .queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("rangepartitioning"), p)
    // the window over the full input partitions by _pid — an empty spec
    // here would mean the single-partition plan this operator exists to avoid
    assert(p.contains("windowspecdefinition(_pid"), p)
  }
}
