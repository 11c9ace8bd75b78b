package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.QuantileSketch
import graft.sources.Tables

/** Bottom-k quantile sketch: decile rank error within the binomial bound
  * on real data, the bottom-k merge identity, and determinism.
  */
final class QuantileSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val events = Tables(spark, TestSpark.Sf0001).events
    .select(col("event_type"),
      expr("CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)").as("v"),
      col("event_id"))

  test("every decile's rank error is within 10% on the corpus") {
    val out = QuantileSketch.sketchWithAudit(events, "event_type", "v", "event_id")
      .as[(String, Int, Double, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (g, p, _, _, errE6) =>
      assert(errE6 <= 100000L, s"$g p$p rank error ${errE6 / 1e4}%")
    }
  }

  test("bottom-k merge identity: re-sketching shard samples equals the direct sample") {
    import graft.operators.HashSplit
    import org.apache.spark.sql.expressions.Window
    val k = 64
    val base = events.filter(col("v").isNotNull)
      .select(col("event_type").as("g"), col("v"),
        HashSplit.md548(col("event_id")).as("hk"), col("event_id").as("rid"))
    def bottomK(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("sr", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("hk"), col("rid"))))
      .filter(col("sr") <= k).drop("sr")
    val direct = bottomK(base)
      .as[(String, Long, Long, Long)].collect().sortBy(t => (t._1, t._3)).toSeq
    val viaShards = bottomK(
      bottomK(base.filter(pmod(col("rid"), lit(2)) === 0))
        .unionByName(bottomK(base.filter(pmod(col("rid"), lit(2)) === 1))))
      .as[(String, Long, Long, Long)].collect().sortBy(t => (t._1, t._3)).toSeq
    assert(viaShards === direct && direct.nonEmpty)
  }

  test("deterministic across runs") {
    def run() = QuantileSketch.sketchWithAudit(events, "event_type", "v", "event_id")
      .as[(String, Int, Double, Long, Long)].collect().sortBy(t => (t._1, t._2)).toSeq
    assert(run() === run())
  }

  test("estimates are monotone across deciles within each group") {
    val out = QuantileSketch.sketchWithAudit(events, "event_type", "v", "event_id")
      .as[(String, Int, Double, Long, Long)].collect()
      .groupBy(_._1).values
    out.foreach { rows =>
      val sorted = rows.sortBy(_._2).map(_._3)
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b })
    }
  }
}
