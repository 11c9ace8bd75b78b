package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamDedupTtl

class StreamDedupTtlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // TimeMode.ProcessingTime ⇒ never processAllAvailable (hangs; see
  // TwsActivitySpec) — poll the memory sink against a deadline.
  private def awaitRows(name: String, want: Long, timeoutMs: Long = 90000L): Unit = {
    val deadline = System.currentTimeMillis + timeoutMs
    while (spark.sql(s"SELECT * FROM $name").count() < want &&
      System.currentTimeMillis < deadline) Thread.sleep(200L)
  }

  test("streaming: first-seen admitted, duplicates suppressed across batches, TTL re-admits") {
    val dir = Files.createTempDirectory("graft-sdt-in")
    val cp = Files.createTempDirectory("graft-sdt-cp").toString
    // batch 1: A twice (min payload 5 wins), B once
    Files.write(dir.resolve("b0.csv"), "A,9\nA,5\nB,3".getBytes)
    val raw = spark.readStream.schema("key STRING, payload LONG")
      .csv(dir.toString).as[StreamDedupTtl.Rec]
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // ttl must comfortably exceed inter-batch latency (file discovery +
    // RocksDB commit can take seconds under sbt) or batch 2's A arrives
    // post-eviction and is legitimately re-admitted — seen in the first
    // run of this spec at ttl=1500
    val q = StreamDedupTtl.dedup(raw, ttlMs = 8000L)
      .writeStream.outputMode("update").format("memory")
      .queryName("sdt_out").option("checkpointLocation", cp).start()
    def rows() = spark.sql("SELECT * FROM sdt_out")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    try {
      awaitRows("sdt_out", 2L)
      assert(rows() == Set(("A", 5L), ("B", 3L)), rows().toString)
      // batch 2 inside the TTL window: A suppressed, C admitted
      Files.write(dir.resolve("b1.csv"), "A,7\nC,1".getBytes)
      awaitRows("sdt_out", 3L)
      assert(rows() == Set(("A", 5L), ("B", 3L), ("C", 1L)),
        s"duplicate A leaked through: ${rows()}")
      // idle past the TTL: A's state evicts; the next A is re-admitted
      Thread.sleep(10000L)
      Files.write(dir.resolve("b2.csv"), "A,9".getBytes)
      awaitRows("sdt_out", 4L)
      assert(rows().contains(("A", 9L)), s"TTL did not re-admit: ${rows()}")
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("static run equals min-payload per key (the oracled parity)") {
    val docs = graft.sources.Tables(spark, TestSpark.Sf0001).documents
    val recs = docs.select(md5($"text").as("key"), $"doc_id".cast("long").as("payload"))
      .as[StreamDedupTtl.Rec]
    val got = StreamDedupTtl.dedup(recs, ttlMs = 3600000L)
      .collect().map(r => (r.key, r.payload)).toMap
    val want = recs.groupBy($"key").agg(min($"payload").as("p"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == want)
  }
}
