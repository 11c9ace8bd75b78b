package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin
import graft.streaming.StreamingAsOf
import graft.streaming.StreamingAsOf.{In, Out}

class StreamingAsOfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("transition function: <= semantics, tiebreaks, state carry") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val st = TestGroupState.create[StreamingAsOf.LastRight](
      org.apache.spark.api.java.Optional.empty[StreamingAsOf.LastRight](),
      GroupStateTimeout.NoTimeout,
      0L, org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = false)
    // right@100(id 20), left@100(id 10): right visible at equal ts;
    // right@100(id 21) also present → larger id wins the tie
    val out = StreamingAsOf.processGroup(1L,
      Iterator(In(1L, 100L, 1, 10L), In(1L, 100L, 0, 20L), In(1L, 100L, 0, 21L)),
      st).toSeq
    assert(out == Seq(Out(1L, 100L, 10L, Some(21L), Some(100L))))
    assert(st.get == StreamingAsOf.LastRight(100L, 21L))
    // next batch: a left BEFORE any new right still sees carried state;
    // a stale right (smaller ts) must not replace it
    val out2 = StreamingAsOf.processGroup(1L,
      Iterator(In(1L, 50L, 0, 22L), In(1L, 200L, 1, 11L)), st).toSeq
    assert(out2 == Seq(Out(1L, 200L, 11L, Some(21L), Some(100L))))
  }

  test("idle-key timeout evicts state; later lefts rejoin unmatched") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val st = TestGroupState.create[StreamingAsOf.LastRight](
      org.apache.spark.api.java.Optional.of(StreamingAsOf.LastRight(100L, 20L)),
      GroupStateTimeout.ProcessingTimeTimeout,
      0L, org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = true)
    assert(StreamingAsOf.processGroup(1L, Iterator.empty, st, 60000L).isEmpty)
    assert(st.isRemoved)
    // after eviction the key behaves like a fresh one
    val st2 = TestGroupState.create[StreamingAsOf.LastRight](
      org.apache.spark.api.java.Optional.empty[StreamingAsOf.LastRight](),
      GroupStateTimeout.ProcessingTimeTimeout,
      0L, org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = false)
    val out = StreamingAsOf.processGroup(1L, Iterator(In(1L, 300L, 1, 30L)), st2, 60000L).toSeq
    assert(out == Seq(Out(1L, 300L, 30L, None, None)))
  }

  test("stream/batch parity with operators.AsOfJoin on a two-batch replay") {
    val rnd = new scala.util.Random(13)
    val rows = (1 to 600).map { i =>
      // ~1/3 lefts, 2/3 rights across 8 keys; ids unique per side
      val side = if (i % 3 == 0) 1 else 0
      In(rnd.nextInt(8).toLong, rnd.nextInt(500).toLong, side, i.toLong)
    }

    // batch expectation via the union-scan operator
    val lefts = rows.filter(_.side == 1).map(r => (r.key, r.ts, r.id))
      .toDF("key", "ts", "left_id")
    val rights = rows.filter(_.side == 0).map(r => (r.key, r.ts, r.id))
      .toDF("key", "ts", "right_id").withColumn("right_ts", col("ts"))
    val expected = AsOfJoin.asOf(lefts, rights, "key", "ts", "right_id",
      Seq("right_id", "right_ts"))
      .select($"key", $"ts", $"left_id", $"right_id", $"right_ts")
      .as[Out].collect().toSet

    // stream the same rows in ts order across two mtime-ordered files
    val dir = Files.createTempDirectory("graft-asof-in")
    val cp = Files.createTempDirectory("graft-asof-cp").toString
    val sorted = rows.sortBy(r => (r.ts, r.side, r.id))
    val cut = sorted(sorted.size / 2).ts
    def csv(rs: Seq[In]): String =
      rs.map(r => s"${r.key},${r.ts},${r.side},${r.id}").mkString("\n")
    val f0 = dir.resolve("b0.csv"); val f1 = dir.resolve("b1.csv")
    Files.write(f0, csv(sorted.filter(_.ts <= cut)).getBytes)
    Files.write(f1, csv(sorted.filter(_.ts > cut)).getBytes)
    Files.setLastModifiedTime(f0, java.nio.file.attribute.FileTime.fromMillis(1000000L))
    Files.setLastModifiedTime(f1, java.nio.file.attribute.FileTime.fromMillis(2000000L))
    val raw = spark.readStream
      .schema("key LONG, ts LONG, side INT, id LONG")
      .option("maxFilesPerTrigger", 1)
      .csv(dir.toString)
      .as[In]
    val q = StreamingAsOf.join(raw)
      .writeStream.outputMode("append").format("memory")
      .queryName("asof_stream_out")
      .option("checkpointLocation", cp)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val got = spark.sql("SELECT * FROM asof_stream_out").as[Out].collect().toSet

    assert(got.nonEmpty)
    assert(got == expected)
  }
}
