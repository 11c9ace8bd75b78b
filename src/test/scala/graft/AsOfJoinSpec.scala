package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, Long)]) = {
    val l = left.toDF("user_id", "ts", "purchase_id")
    val r = right.toDF("user_id", "ts", "view_id")
      .withColumn("view_ts", col("ts"))
    AsOfJoin.asOf(l, r, "user_id", "ts", "view_id", Seq("view_id", "view_ts"))
      .select($"purchase_id", $"view_id", $"view_ts")
      .as[(Long, Option[Long], Option[Long])].collect().toSet
  }

  test("matches the latest right row at or before each left ts") {
    val got = run(
      left = Seq((1L, 100L, 10L), (1L, 200L, 11L)),
      right = Seq((1L, 50L, 20L), (1L, 150L, 21L), (1L, 250L, 22L)))
    assert(got == Set((10L, Some(20L), Some(50L)), (11L, Some(21L), Some(150L))))
  }

  test("equal timestamps: right row is visible (<= semantics), max order col wins ties") {
    val got = run(
      left = Seq((1L, 100L, 10L)),
      // two views exactly at the purchase ts — the larger view_id must win
      right = Seq((1L, 100L, 20L), (1L, 100L, 21L)))
    assert(got == Set((10L, Some(21L), Some(100L))))
  }

  test("left rows with no prior right row get nulls; keys don't leak across") {
    val got = run(
      left = Seq((1L, 100L, 10L), (2L, 500L, 11L)),
      right = Seq((1L, 400L, 20L), (3L, 1L, 30L)))
    assert(got == Set((10L, None, None), (11L, None, None)))
  }

  test("plan shape: exactly one shuffle (the key partitioning), no join node") {
    val l = Seq((1L, 100L, 10L)).toDF("user_id", "ts", "purchase_id")
    val r = Seq((1L, 50L, 20L)).toDF("user_id", "ts", "view_id")
      .withColumn("view_ts", col("ts"))
    val plan = AsOfJoin.asOf(l, r, "user_id", "ts", "view_id", Seq("view_id", "view_ts"))
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1, s"want exactly 1 exchange:\n$plan")
    assert(!plan.toLowerCase.contains("join"), s"union-scan spelling must not join:\n$plan")
  }

  test("null-ts right rows never match; null-key/ts lefts emit unmatched") {
    val l = Seq(
      (Option(1L), Option(100L), 10L),
      (Option.empty[Long], Option(50L), 11L), // null key
      (Option(1L), Option.empty[Long], 12L) // null ts
    ).toDF("user_id", "ts", "purchase_id")
    val r = Seq(
      (Option(1L), Option.empty[Long], 20L), // null ts — must never attach
      (Option.empty[Long], Option(10L), 21L) // null key — must never attach
    ).toDF("user_id", "ts", "view_id").withColumn("view_ts", col("ts"))
    val got = AsOfJoin.asOf(l, r, "user_id", "ts", "view_id", Seq("view_id", "view_ts"))
      .select($"purchase_id", $"view_id").as[(Long, Option[Long])].collect().toSet
    assert(got == Set((10L, None), (11L, None), (12L, None)))
  }

  test("micros truncation ties: view_id DESC decides, not the lost nanos") {
    // q_asof_attribution runs on ts_ns DIV 1000 (DuckDB truncates parquet
    // TIMESTAMP(NANOS) to micros at scan, so micros is the shared time
    // axis). Two views in the SAME microsecond — nanos order 20 before 21,
    // so nanos-axis as-of would pick 21 by recency while a truncation that
    // kept nanos ordering hidden in the sort could pick either. Pin the
    // oracle's rule: among equal micros the larger view_id wins, on both
    // the earlier-nanos and later-nanos layouts.
    val purchases = Seq((1L, 1_000_002_500L, 10L), (2L, 1_000_002_500L, 11L))
      .toDF("user_id", "ts_ns", "purchase_id")
    val views = Seq(
      (1L, 1_000_001_100L, 20L), // micro 1_000_001, earlier nanos
      (1L, 1_000_001_900L, 21L), // micro 1_000_001, later nanos
      (2L, 1_000_001_900L, 30L), // micro 1_000_001, later nanos
      (2L, 1_000_001_100L, 31L)  // micro 1_000_001, earlier nanos but larger id
    ).toDF("user_id", "ts_ns", "view_id")
    def us(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("ts", expr("ts_ns DIV 1000")).drop("ts_ns")
    val got = AsOfJoin.asOf(
      us(purchases), us(views).withColumn("view_ts", col("ts")),
      "user_id", "ts", "view_id", Seq("view_id", "view_ts"))
      .select($"purchase_id", $"view_id").as[(Long, Option[Long])].collect().toSet
    // larger view_id wins the micro-tie regardless of which nanos came last
    assert(got == Set((10L, Some(21L)), (11L, Some(31L))))
  }

  test("agrees with the naive range-join spelling on random data") {
    val rnd = new scala.util.Random(11)
    val left = (1 to 300).map(i => (rnd.nextInt(10).toLong, rnd.nextInt(1000).toLong, i.toLong))
    val right = (1 to 300).map(i => (rnd.nextInt(10).toLong, rnd.nextInt(1000).toLong, 1000L + i))
    val got = run(left, right)

    val naive = left.map { case (u, ts, pid) =>
      val cands = right.filter(r => r._1 == u && r._2 <= ts)
      if (cands.isEmpty) (pid, None, None)
      else {
        val best = cands.maxBy(r => (r._2, r._3))
        (pid, Some(best._3), Some(best._2))
      }
    }.toSet
    assert(got == naive)
  }
}
