package graft.streaming

import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ml.Heuristic

/** Deterministic replay of the serving-plane metrics document — the bridge
  * between the batch tables and the dashboard reads
  * (reference dashboard/app.py:227-354): per-hour "batches" of the events
  * table are pushed through the REAL [[MetricsStore]] (atomic JSON, same
  * document shape the streaming job writes), and the dashboard queries
  * then run over the store file exactly as they would against a live
  * stream's output. This closes the §2.11 serving-plane read path with
  * zero environment dependencies: conversion-rate series (app.py:227-238),
  * event distribution over the last 10 batches (:243-266), and the
  * intent-bucketed prediction table (:311-354).
  *
  * Determinism contract (what makes these oracle-able, unlike the live
  * path): batch_id is the event-time hour bucket (not an arrival-order
  * micro-batch id) and the per-batch `timestamp` is the bucket start
  * formatted ISO-UTC (the reference stamps wall-clock `datetime.now()` —
  * unreproducible by design; the bucket start is the deterministic twin).
  * Everything else is the reference's shape: totals, conversion rate
  * (purchases/carts·100, the [[graft.operators.Featurize.batchTotals]]
  * spelling), and a predictions list for the newest batch scored by the
  * [[Heuristic]] rule ladder.
  *
  * Scale shape: the per-batch metrics are ONE distributed aggregate; the
  * driver loop that feeds the store walks the COLLECTED batch rows —
  * bounded by the time axis (hours over a decade < 100k rows), the
  * [[graft.operators.IntervalOverlap]] bucket-table argument — and the
  * predictions collect is LIMIT-bounded (topN, the StreamJob
  * maxScoredRows discipline). The store itself is driver-side by nature
  * (it is the serving plane's file).
  */
object MetricsReplay {

  private val IsoUtc =
    DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss").withZone(ZoneOffset.UTC)

  /** Per-hour batch metrics from the events table:
    * (batch_id, ts_s, total_views, total_carts, total_purchases,
    * conversion_rate). batch_id = hour bucket; conversion_rate is the
    * single exact-integer division (bitwise cross-engine), carts=0 → 0.
    */
  def batchMetrics(events: DataFrame): DataFrame =
    events
      .select(col("event_type"), col("ts").cast("long").as("ts_s"))
      .withColumn("batch_id", expr("ts_s DIV 3600"))
      .groupBy(col("batch_id"))
      .agg(
        count(when(col("event_type") === "view", 1)).as("total_views"),
        count(when(col("event_type") === "click", 1)).as("total_carts"),
        count(when(col("event_type") === "purchase", 1)).as("total_purchases"))
      .select(
        col("batch_id"), (col("batch_id") * 3600L).as("ts_s"),
        col("total_views"), col("total_carts"), col("total_purchases"),
        when(col("total_carts") === 0L, lit(0.0d))
          .otherwise(col("total_purchases").cast("double") /
            col("total_carts") * lit(100.0d))
          .as("conversion_rate"))

  /** Newest-batch session predictions (the reference's per-batch scored
    * sessions): sessions active in the LAST hour bucket, features over
    * that bucket's events, probability from the deterministic
    * [[Heuristic]] ladder; top `n` by (probability desc, session_id).
    */
  def lastBatchPredictions(events: DataFrame, n: Int = 20): DataFrame = {
    val ev = events.select(
      concat(col("user_id").cast("string"), lit("_"),
        date_format(col("ts"), "yyyy-MM-dd")).as("session_id"),
      col("event_type"), col("value"),
      col("ts").cast("long").as("ts_s"))
      .withColumn("batch_id", expr("ts_s DIV 3600"))
    val lastB = ev.agg(max(col("batch_id")).as("_mb"))
    val feats = ev
      .crossJoin(broadcast(lastB))
      .filter(col("batch_id") === col("_mb"))
      .groupBy(col("session_id"))
      .agg(
        count(when(col("event_type") === "view", 1)).as("view_count"),
        count(when(col("event_type") === "click", 1)).as("cart_count"),
        (max(col("ts_s")) - min(col("ts_s"))).as("session_duration"),
        round(avg(col("value")), 6).as("avg_price"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("_purchased"))
    feats
      .select(col("session_id"), col("view_count"), col("cart_count"),
        col("session_duration"), col("avg_price"),
        Heuristic.score(col("cart_count"), col("view_count"))
          .as("purchase_probability"),
        (col("_purchased") === 1L).as("has_purchased"))
      .orderBy(col("purchase_probability").desc, col("session_id"))
      .limit(n)
  }

  /** Replay the event-time batches through a real [[MetricsStore]] at
    * `path`: one `update` per hour bucket in batch order, predictions
    * attached to the newest batch's document. Returns the batch count.
    */
  def writeStore(events: DataFrame, path: String, topN: Int = 20): Int = {
    val batches = batchMetrics(events).orderBy(col("batch_id")).collect()
    if (batches.isEmpty) {
      // zero batches: predictions are provably empty too (same events) —
      // skip those Spark jobs and write a valid empty document, atomically
      // (writeStore is public; a live path may have concurrent readers)
      MetricsStore.writeEmpty(path)
      return 0
    }
    val preds = lastBatchPredictions(events, topN).collect().map { r =>
      Map(
        "session_id" -> r.getAs[String]("session_id"),
        "features" -> Map(
          "view_count" -> r.getAs[Long]("view_count"),
          "cart_count" -> r.getAs[Long]("cart_count"),
          "session_duration" -> r.getAs[Long]("session_duration"),
          "avg_price" -> r.getAs[Any]("avg_price")),
        "purchase_probability" -> r.getAs[Double]("purchase_probability"),
        "has_purchased" -> r.getAs[Boolean]("has_purchased"))
    }.toSeq
    val store = new MetricsStore(path, historyLimit = batches.length.max(1))
    batches.zipWithIndex.foreach { case (b, i) =>
      val base = Map(
        "batch_id" -> b.getAs[Long]("batch_id"),
        "timestamp" -> IsoUtc.format(Instant.ofEpochSecond(b.getAs[Long]("ts_s"))),
        "ts_s" -> b.getAs[Long]("ts_s"),
        "total_views" -> b.getAs[Long]("total_views"),
        "total_carts" -> b.getAs[Long]("total_carts"),
        "total_purchases" -> b.getAs[Long]("total_purchases"),
        "conversion_rate" -> b.getAs[Double]("conversion_rate"))
      store.update(
        if (i == batches.length - 1) base + ("predictions" -> preds) else base)
    }
    batches.length
  }

  /** Store path for a given table dir — one file per dataset so
    * cross-SF runs never read each other's replay. */
  def storePath(tableDir: String): String = {
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(tableDir.getBytes("UTF-8")).map("%02x".format(_)).mkString
    s"${sys.props("java.io.tmpdir")}/graft_metrics_replay_$key.json"
  }

  // One replay per dataset per JVM. Two reasons, both load-bearing:
  // (1) CORRECTNESS — Verify runs queries on a thread pool, and a reader
  //     racing another query's in-progress replay could observe a
  //     mid-replay document whose current batch has no `predictions` yet
  //     (each update atomically rewrites the file, but intermediate
  //     updates are themselves complete-looking documents). The replay
  //     therefore writes to a private temp path and moves it into place
  //     ATOMICALLY once complete, and concurrent callers block on the
  //     memo until the store is fully built.
  // (2) COST ATTRIBUTION — building the store is the stream-WRITER's
  //     work; the dashboard-read queries should pay only the read. The
  //     memo charges the replay to the first reader per process instead
  //     of three times over.
  private val built = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Build (once per JVM) the store for `events` and return its path.
    * Readers never observe a partial store: the replay happens on a temp
    * file that is atomically moved over the final path when complete.
    */
  def ensureStore(events: DataFrame, tableDir: String): String =
    built.computeIfAbsent(tableDir, { _ =>
      import java.nio.file.{Files, Paths, StandardCopyOption}
      val p = storePath(tableDir)
      val tmp = p + ".build." + java.util.UUID.randomUUID().toString.take(8)
      writeStore(events, tmp)
      Files.move(Paths.get(tmp), Paths.get(p),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
      p
    })

  /** Dashboard read #2 (app.py:243-266): event-distribution totals over
    * the last `lastN` batches — one row
    * (n_batches, total_views, total_carts, total_purchases).
    */
  def eventDistribution(spark: SparkSession, path: String, lastN: Int = 10): DataFrame = {
    val h = MetricsStore.historyFrame(spark, path)
    h.orderBy(col("batch_id").desc).limit(lastN)
      .agg(
        count(lit(1)).as("n_batches"),
        // coalesce: sum over an empty store is null, and empty must
        // report 0 (the DataQuality empty-partition principle)
        coalesce(sum(col("total_views")), lit(0L)).as("total_views"),
        coalesce(sum(col("total_carts")), lit(0L)).as("total_carts"),
        coalesce(sum(col("total_purchases")), lit(0L)).as("total_purchases"))
  }
}
