package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("matches the naive BETWEEN join exactly, each pair exactly once") {
    val rnd = new scala.util.Random(7)
    val points = (1 to 300).map(_ => rnd.nextInt(10000).toLong).distinct
      .toDF("p")
    val intervals = (1 to 80).map { i =>
      val lo = rnd.nextInt(9000).toLong
      (i.toLong, lo, lo + rnd.nextInt(2000).toLong)
    }.toDF("iid", "lo", "hi")
    for (width <- Seq(100L, 1000L, 7L)) {
      val got = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", width)
        .select($"p", $"iid").as[(Long, Long)].collect()
      val naive = points.join(intervals, $"p".between($"lo", $"hi"))
        .select($"p", $"iid").as[(Long, Long)].collect()
      assert(got.sorted.sameElements(naive.sorted), s"width=$width")
      assert(got.length == got.distinct.length, s"duplicate pairs at width=$width")
    }
  }

  test("keyed variant matches the naive keyed BETWEEN join") {
    val rnd = new scala.util.Random(17)
    val points = (1 to 200).map(i =>
      (i.toLong, s"u${rnd.nextInt(5)}", rnd.nextInt(5000).toLong))
      .toDF("pid", "u", "p")
    val intervals = (1 to 40).map { i =>
      val lo = rnd.nextInt(4500).toLong
      (i.toLong, s"u${rnd.nextInt(5)}", lo, lo + rnd.nextInt(800).toLong)
    }.toDF("iid", "u", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", 250L,
        keyCols = Seq("u"))
      .select($"pid", $"iid").as[(Long, Long)].collect()
    val naive = points.join(intervals.withColumnRenamed("u", "u2"),
        $"u" === $"u2" && $"p".between($"lo", $"hi"))
      .select($"pid", $"iid").as[(Long, Long)].collect()
    assert(got.sorted.sameElements(naive.sorted) && got.nonEmpty)
    assert(got.length == got.distinct.length)
  }

  test("plans as an equi-join: no nested loop, no cartesian product") {
    val points = spark.range(100).select($"id".as("p"))
    val intervals = spark.range(50)
      .select($"id".as("iid"), ($"id" * 10).as("lo"), ($"id" * 10 + 25).as("hi"))
    val plan = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan.take(1500))
  }

  test("an interval spanning more than the bucket cap fails fast") {
    val points = Seq(5L).toDF("p")
    val bad = Seq((1L, 0L, 10000000L)).toDF("iid", "lo", "hi")
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(points, "p", bad, "lo", "hi", 10L,
        maxBucketsPerInterval = 1000L).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("RangeJoin")))
  }
}
