package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ewma
import graft.streaming.StreamingEwma
import graft.streaming.StreamingEwma.{EwmaState, Obs, Point}

/** Transition-function units (exact micro states across batches, zero-fill,
  * open-bucket holdback) + a two-micro-batch file replay pinned to the
  * batch operator.
  */
final class StreamingEwmaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshState(prev: Option[EwmaState] = None) = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    TestGroupState.create[EwmaState](
      prev.map(org.apache.spark.api.java.Optional.of[EwmaState])
        .getOrElse(org.apache.spark.api.java.Optional.empty[EwmaState]()),
      GroupStateTimeout.NoTimeout,
      0L, org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = false)
  }

  test("transition: open bucket held back, zero-fill on gaps, exact states") {
    val st = freshState()
    // batch 1: 2 events in bucket 0, 1 in bucket 1 → emit bucket 0 only
    val out1 = StreamingEwma.processGroup("a",
      Iterator(Obs("a", 0L), Obs("a", 1L), Obs("a", 0L)), st, 3, 10L).toSeq
    assert(out1 === Seq(Point("a", 0L, 2L, 2000000L)))
    assert(st.get === EwmaState(2000000L, 0L, 1L, 1L, started = true))
    // batch 2: 8 events in bucket 3 → emits bucket 1 (x=1) and the
    // zero-filled bucket 2; bucket 3 stays open
    val st2 = freshState(Some(st.get))
    val out2 = StreamingEwma.processGroup("a",
      Iterator.fill(8)(Obs("a", 3L)), st2, 3, 10L).toSeq
    // s1 = 2e6 + floor(-1e6/8) = 1_875_000; s2 = 1_875_000 +
    // floor(-1_875_000/8) = 1_875_000 - 234_375 = 1_640_625
    assert(out2 === Seq(
      Point("a", 10L, 1L, 1875000L), Point("a", 20L, 0L, 1640625L)))
    assert(st2.get === EwmaState(1640625L, 2L, 3L, 8L, started = true))
  }

  test("single-bucket batch emits nothing and keeps the bucket open") {
    val st = freshState()
    val out = StreamingEwma.processGroup("b",
      Iterator(Obs("b", 5L), Obs("b", 5L)), st, 3, 10L).toSeq
    assert(out.isEmpty)
    assert(st.get === EwmaState(0L, 4L, 5L, 2L, started = false))
    // the key's own first bucket is the origin — NOT bucket 4
    val st2 = freshState(Some(st.get))
    val out2 = StreamingEwma.processGroup("b", Iterator(Obs("b", 6L)), st2, 3, 10L).toSeq
    assert(out2 === Seq(Point("b", 50L, 2L, 2000000L)))
  }

  test("late arrival below an emitted bucket is counted, not silently lost") {
    val st = freshState()
    StreamingEwma.processGroup("c",
      Iterator(Obs("c", 0L), Obs("c", 1L), Obs("c", 2L)), st, 3, 10L).toSeq
    assert(st.get.lastEmitted === 1L && st.get.droppedLate === 0L)
    // buckets 0 and 1 are already emitted — two violations of the
    // bucket-aligned-arrival assumption; bucket 2 stays open and intact
    val st2 = freshState(Some(st.get))
    val out = StreamingEwma.processGroup("c",
      Iterator(Obs("c", 0L), Obs("c", 1L), Obs("c", 3L)), st2, 3, 10L).toSeq
    assert(out === Seq(Point("c", 20L, 1L, st.get.s + (1000000L - st.get.s) / 8)))
    assert(st2.get.droppedLate === 2L)
    // the counter is cumulative across batches
    val st3 = freshState(Some(st2.get))
    StreamingEwma.processGroup("c", Iterator(Obs("c", 1L), Obs("c", 4L)), st3, 3, 10L).toSeq
    assert(st3.get.droppedLate === 3L)
  }

  test("two-micro-batch file replay matches the batch operator") {
    import spark.implicits._
    // every type present in bucket 0 → streaming origin == batch global
    // grid origin; closed buckets are 0..2, bucket 3 stays open
    val events = Seq(
      ("x", 1L), ("x", 2L), ("x", 12L), ("y", 3L),
      ("x", 25L), ("y", 22L), ("x", 31L), ("y", 35L))
    val dir = Files.createTempDirectory("graft-ewma-in")
    val checkpoint = Files.createTempDirectory("graft-ewma-cp").toString
    val (h0, h1) = events.sortBy(_._2).splitAt(4)
    def csv(rows: Seq[(String, Long)]) =
      rows.map { case (t, s) => s"$t,$s" }.mkString("\n")
    val f0 = dir.resolve("b0.csv"); val f1 = dir.resolve("b1.csv")
    Files.write(f0, csv(h0).getBytes)
    Files.write(f1, csv(h1).getBytes)
    Files.setLastModifiedTime(f0, java.nio.file.attribute.FileTime.fromMillis(1000000L))
    Files.setLastModifiedTime(f1, java.nio.file.attribute.FileTime.fromMillis(2000000L))
    spark.conf.set("spark.sql.streaming.fileSource.maxFilesPerTrigger", "1")
    val raw = spark.readStream.schema("event_type STRING, s LONG").csv(dir.toString)
      .select(col("event_type"), expr("s DIV 10").as("bucket"))
      .as[Obs]
    val q = StreamingEwma.levels(raw, shift = 3, bucketSeconds = 10L)
      .writeStream.outputMode("append").format("memory").queryName("ewma_live")
      .option("checkpointLocation", checkpoint).start()
    try q.processAllAvailable()
    finally q.stop()
    val got = spark.sql("SELECT * FROM ewma_live")
      .as[Point].collect().map(p => (p.event_type, p.bucket_s) -> p).toMap
    val batch = Ewma.bucketEwma(
      events.toDF("event_type", "s")
        .select(col("event_type"), timestamp_seconds(col("s")).as("ts")),
      bucketSeconds = 10L)
      .filter(col("bucket_s") < 30L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        Point(r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got === batch)
    assert(got.nonEmpty)
  }
}
