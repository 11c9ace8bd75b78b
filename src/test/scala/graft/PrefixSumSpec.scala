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

  test("full input flows through a range exchange and a _pid window, never one task") {
    val p = PrefixSum.runningTotal(rows, Seq("k"), "v", numPartitions = 7)
      .queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("rangepartitioning"), p)
    // the window over the full input partitions by _pid — an empty spec
    // here would mean the single-partition plan this operator exists to avoid
    assert(p.contains("windowspecdefinition(_pid"), p)
  }
}
