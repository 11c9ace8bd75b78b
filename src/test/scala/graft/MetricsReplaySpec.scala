package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{MetricsReplay, MetricsStore}

/** Closed-form serving-plane replay: constructed events → real store file
  * → dashboard reads (conversion series, event distribution, prediction
  * table), hand-checked values.
  */
final class MetricsReplaySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def events = {
    import spark.implicits._
    // two hour-buckets: h0 = 10:00 (1 view u1), h1 = 11:00 (u1: 1 view +
    // 2 clicks + 1 purchase; u2: 1 view)
    Seq(
      ("2024-03-01 10:10:00", "view", 1L, 10.0),
      ("2024-03-01 11:05:00", "view", 1L, 20.0),
      ("2024-03-01 11:10:00", "click", 1L, 30.0),
      ("2024-03-01 11:20:00", "click", 1L, 40.0),
      ("2024-03-01 11:30:00", "purchase", 1L, 40.0),
      ("2024-03-01 11:40:00", "view", 2L, 5.0)
    ).toDF("ts_str", "event_type", "user_id", "value")
      .select(to_timestamp(col("ts_str")).as("ts"),
        col("event_type"), col("user_id"), col("value"))
  }

  test("store round trip: series, distribution, predictions all hand-check") {
    val path = Files.createTempDirectory("graft-mr").resolve("m.json").toString
    val n = MetricsReplay.writeStore(events, path)
    assert(n === 2)

    val series = MetricsStore.conversionSeries(spark, path, 50).collect()
    assert(series.length === 2)
    // newest first; h1: 1 purchase / 2 carts → 50.0; h0: 0 carts → 0.0
    assert(series(0).getAs[Double]("conversion_rate") === 50.0)
    assert(series(1).getAs[Double]("conversion_rate") === 0.0)
    assert(series(0).getAs[String]("timestamp").endsWith("T11:00:00"))

    val dist = MetricsReplay.eventDistribution(spark, path, 10).collect().head
    assert(dist.getAs[Long]("n_batches") === 2L)
    assert(dist.getAs[Long]("total_views") === 3L)
    assert(dist.getAs[Long]("total_carts") === 2L)
    assert(dist.getAs[Long]("total_purchases") === 1L)

    // last-N rank semantics: lastN=1 keeps only the newest bucket
    val dist1 = MetricsReplay.eventDistribution(spark, path, 1).collect().head
    assert(dist1.getAs[Long]("total_views") === 2L)

    val preds = MetricsStore.predictionTable(spark, path, 20).collect()
    // newest batch (h1) sessions: u1 (1 view, 2 carts, purchased) and
    // u2 (1 view); ladder: cart_count>=1 → 0.60; else 0.05
    assert(preds.length === 2)
    val u1 = preds.find(_.getAs[String]("session_id") == "1_2024-03-01").get
    assert(u1.getAs[Long]("view_count") === 1L)
    assert(u1.getAs[Long]("cart_count") === 2L)
    assert(u1.getAs[Double]("purchase_probability") === 0.60)
    assert(u1.getAs[String]("status") === "purchased") // purchase wins the bucket
    assert(u1.getAs[Long]("session_duration") === (25L * 60L)) // 11:05 → 11:30
    val u2 = preds.find(_.getAs[String]("session_id") == "2_2024-03-01").get
    assert(u2.getAs[Double]("purchase_probability") === 0.05)
    assert(u2.getAs[String]("status") === "browsing")
    // ranked desc by probability
    assert(preds.head.getAs[String]("session_id") === "1_2024-03-01")
  }

  test("zero-batch events still produce a valid empty store") {
    import org.apache.spark.sql.functions.col
    val empty = events.filter(col("user_id") === -1L)
    val p = MetricsReplay.ensureStore(empty, "graft-empty-test-" + System.nanoTime)
    assert(Files.exists(java.nio.file.Paths.get(p)))
    val dist = MetricsReplay.eventDistribution(spark, p, 10).collect().head
    assert(dist.getAs[Long]("n_batches") === 0L)
    // empty reports ZEROS, not nulls (the DataQuality empty principle)
    Seq("total_views", "total_carts", "total_purchases").foreach { c =>
      assert(!dist.isNullAt(dist.fieldIndex(c)), c)
      assert(dist.getAs[Long](c) === 0L)
    }
    assert(MetricsStore.predictionTable(spark, p, 20).collect().isEmpty)
  }

  test("ensureStore builds once per JVM and only exposes complete stores") {
    import java.nio.file.Paths
    val key = "graft-ensure-test-" + System.nanoTime
    val p1 = MetricsReplay.ensureStore(events, key)
    val mtime1 = Files.getLastModifiedTime(Paths.get(p1))
    // the final file is complete: the prediction read never sees the
    // mid-replay documents (they live on the temp path until the move)
    assert(MetricsStore.predictionTable(spark, p1, 20).collect().nonEmpty)
    val base = Paths.get(p1).getFileName.toString
    val leftovers = java.nio.file.Files.list(Paths.get(p1).getParent)
      .filter(f => f.getFileName.toString.startsWith(base + ".build."))
      .count()
    assert(leftovers === 0L)
    // second call is the memo, not a rewrite
    val p2 = MetricsReplay.ensureStore(events, key)
    assert(p2 === p1)
    assert(Files.getLastModifiedTime(Paths.get(p1)) === mtime1)
  }
}
