package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S5/S10: rate-limited event replayer — the Scala twin of the reference's
  * Kafka producer simulator (reference: src/streaming/kafka_producer.py:
  * 90-197 — keyed sends, batch 100, 1000 events/s, chunked iteration).
  *
  * Events stream through `toLocalIterator` (one partition in memory at a
  * time — the Spark-native version of the reference's 10k-row pandas chunks)
  * and are emitted in timed batches, either to Kafka or to a directory of
  * JSON-lines files that a `readStream.format("text")` source tails (the
  * broker-free test path).
  */
object Replayer {

  /** Kafka-shaped (key, value) frame: keyed by `user_session` for partition
    * affinity (one session → one partition, kafka_producer.py:184-188),
    * value = JSON event envelope + producer-added ingestion_time.
    */
  def eventJson(clickstream: DataFrame): DataFrame =
    clickstream
      // wire format parity: event_time travels as the reference's
      // "yyyy-MM-dd HH:mm:ss UTC" string (config.py:156), not ISO-8601
      .withColumn("event_time", date_format(col("event_time"), "yyyy-MM-dd HH:mm:ss 'UTC'"))
      .withColumn("ingestion_time", date_format(current_timestamp(), "yyyy-MM-dd HH:mm:ss"))
      .select(
        col("user_session").cast("string").as("key"),
        to_json(struct(col("*"))).as("value")
      )

  /** Replay to a directory as one JSON-lines file per batch. Returns events
    * written. Rate limiting mirrors the reference: sleep so that at most
    * `eventsPerSec` rows are emitted per second.
    */
  def replayToDirectory(
      clickstream: DataFrame,
      dir: String,
      eventsPerSec: Int = 1000,
      batchSize: Int = 100,
      maxEvents: Long = Long.MaxValue
  ): Long = {
    Files.createDirectories(Paths.get(dir))
    val it = eventJson(clickstream).select("value").toLocalIterator()
    var written = 0L
    var batchIdx = 0
    val nanosPerEvent = 1e9 / eventsPerSec
    val start = System.nanoTime()
    val batch = new scala.collection.mutable.ArrayBuffer[String](batchSize)
    def flush(): Unit = if (batch.nonEmpty) {
      val tmp = Paths.get(dir, f".batch$batchIdx%06d.jsonl.tmp")
      val dst = Paths.get(dir, f"batch$batchIdx%06d.jsonl")
      Files.write(tmp, batch.mkString("\n").getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, dst, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      batchIdx += 1
      batch.clear()
    }
    while (it.hasNext && written < maxEvents) {
      batch += it.next().getString(0)
      written += 1
      if (batch.size >= batchSize) {
        flush()
        // sleep to hold the configured rate
        val due = start + (written * nanosPerEvent).toLong
        val lag = due - System.nanoTime()
        if (lag > 0) Thread.sleep(lag / 1000000, (lag % 1000000).toInt)
      }
    }
    flush()
    written
  }

  /** Replay to Kafka via the built-in sink (`acks=all`, retries mirrored from
    * the reference producer config). Requires the Kafka connector on the
    * classpath and a live broker — wired but not exercisable in this
    * container (no broker, no connector jar).
    */
  def replayToKafka(
      clickstream: DataFrame,
      bootstrap: String,
      topic: String
  ): Unit =
    eventJson(clickstream).write
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("kafka.acks", "all")
      .option("kafka.retries", "3")
      .option("topic", topic)
      .save()
}
