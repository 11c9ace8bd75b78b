package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sessionize
import graft.streaming.GapSessionizer
import graft.streaming.GapSessionizer.{ClosedSession, Event}

class GapSessionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("static gap sessionization splits on gaps > threshold") {
    val df = Seq(
      (1L, 1L, "2024-01-01 10:00:00", 1.0),
      (2L, 1L, "2024-01-01 10:10:00", 2.0), // same session (gap 600 ≤ 1800)
      (3L, 1L, "2024-01-01 11:00:00", 3.0), // gap 3000 > 1800 → new session
      (4L, 2L, "2024-01-01 10:00:00", 4.0)
    ).toDF("event_id", "user_id", "ts_str", "value")
      .withColumn("ts", to_timestamp($"ts_str"))
    val s = Sessionize.gapSessions(df, "user_id", "ts", 1800L, Some("event_id"))
      .select($"event_id", $"session_id").as[(Long, String)].collect().toMap
    assert(s(1L) == "1_1" && s(2L) == "1_1")
    assert(s(3L) == "1_2")
    assert(s(4L) == "2_1")
  }

  test("streaming gap sessionizer: state transition function") {
    // closed-over unit test of the pure transition logic via static Dataset run
    val events = Seq(
      Event(1L, 1000L, 1.0), Event(1L, 1100L, 2.0), // session 1
      Event(1L, 5000L, 3.0), // gap 3900 > 1800 → closes session 1
      Event(2L, 2000L, 4.0)
    ).toDS()
    // batch (non-streaming) flatMapGroupsWithState executes synchronously
    val closed = GapSessionizer.sessions(events, gapSeconds = 1800L, timeoutMs = 0L).collect()
    // in batch mode state never times out: only sessions closed by a gap emit
    assert(closed.toSeq == Seq(ClosedSession(1L, 1000L, 1100L, 2, 100L, 3.0)))
  }

  test("timeout flush emits the open session and clears state") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val st = TestGroupState.create[GapSessionizer.OpenSession](
      org.apache.spark.api.java.Optional.of(GapSessionizer.OpenSession(1000L, 1100L, 2L, 3.0)),
      GroupStateTimeout.ProcessingTimeTimeout,
      0L, org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = true)
    val out = GapSessionizer.processGroup(1L, Iterator.empty, st, 1800L, 60000L).toSeq
    assert(out == Seq(ClosedSession(1L, 1000L, 1100L, 2L, 100L, 3.0)))
    assert(st.isRemoved)
  }

  test("streaming gap sessionizer over a real stream emits gap-closed sessions") {
    val dir = Files.createTempDirectory("graft-gap-in")
    val checkpoint = Files.createTempDirectory("graft-gap-cp").toString
    Files.write(dir.resolve("b0.csv"),
      "1,1000,1.0\n1,1200,2.0\n1,9000,3.0\n2,500,4.0".getBytes)
    val raw = spark.readStream
      .schema("user_id LONG, ts_s LONG, value DOUBLE")
      .csv(dir.toString)
      .selectExpr("user_id", "ts_s", "value")
      .as[Event]
    // NoTimeout: a timeout-bearing query schedules batches forever and
    // processAllAvailable never returns (observed hang)
    val out = GapSessionizer.sessions(raw, gapSeconds = 1800L, timeoutMs = 0L)
    val q = out.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("gap_sessions_out")
      .option("checkpointLocation", checkpoint)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val rows = spark.sql("SELECT * FROM gap_sessions_out").as[ClosedSession].collect()
    assert(rows.toSeq == Seq(ClosedSession(1L, 1000L, 1200L, 2, 200L, 3.0)))
  }

  test("stream/batch parity: GapSessionizer ≡ Sessionize.gapSessions on the same events") {
    // The W1≡J1 pattern applied to the T-plane: the stateful streaming
    // operator and the lag+running-sum batch spelling must assign identical
    // session boundaries. Values are multiples of 0.25 (exact in binary) so
    // summation order can't perturb total_value.
    val rnd = new scala.util.Random(7)
    val events = (1 to 25).flatMap { u =>
      var ts = u * 1000L
      (1 to 40).map { i =>
        ts += (if (rnd.nextInt(5) == 0) 3600L else 10L + rnd.nextInt(600))
        (u.toLong, ts, rnd.nextInt(8) * 0.25)
      }
    }

    // batch side: per-session aggregates, minus each user's final session
    // (streaming with NoTimeout only emits sessions closed by gap evidence)
    val df = events.toDF("user_id", "ts_s", "value")
    val sess = Sessionize.gapSessions(df, "user_id", "ts_s", 900L)
    val agg = sess.groupBy($"user_id", $"session_idx")
      .agg(min($"ts_s").as("start_s"), max($"ts_s").as("end_s"),
        count(lit(1)).as("n_events"), sum($"value").as("total_value"))
    val lastIdx = sess.groupBy($"user_id").agg(max($"session_idx").as("_last"))
    val expected = agg.join(lastIdx, "user_id").filter($"session_idx" < $"_last")
      .select($"user_id", $"start_s", $"end_s", $"n_events",
        ($"end_s" - $"start_s").as("duration_s"), $"total_value")
      .as[ClosedSession].collect().toSet

    // stream side: replay the same rows in ts order, split across two files
    // processed as separate micro-batches (mtime-ordered, one file per
    // trigger) so open sessions genuinely cross a batch boundary
    val dir = Files.createTempDirectory("graft-gap-parity-in")
    val checkpoint = Files.createTempDirectory("graft-gap-parity-cp").toString
    val sorted = events.sortBy(_._2)
    val cut = sorted(sorted.size / 2)._2
    def csv(rows: Seq[(Long, Long, Double)]): String =
      rows.map { case (u, t, v) => f"$u,$t,$v%.2f" }.mkString("\n")
    val f0 = dir.resolve("b0.csv"); val f1 = dir.resolve("b1.csv")
    Files.write(f0, csv(sorted.filter(_._2 <= cut)).getBytes)
    Files.write(f1, csv(sorted.filter(_._2 > cut)).getBytes)
    Files.setLastModifiedTime(f0, java.nio.file.attribute.FileTime.fromMillis(1000000L))
    Files.setLastModifiedTime(f1, java.nio.file.attribute.FileTime.fromMillis(2000000L))
    val raw = spark.readStream
      .schema("user_id LONG, ts_s LONG, value DOUBLE")
      .option("maxFilesPerTrigger", 1)
      .csv(dir.toString)
      .as[Event]
    val q = GapSessionizer.sessions(raw, gapSeconds = 900L, timeoutMs = 0L)
      .writeStream.outputMode("append").format("memory")
      .queryName("gap_parity_out")
      .option("checkpointLocation", checkpoint)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val got = spark.sql("SELECT * FROM gap_parity_out").as[ClosedSession].collect().toSet

    assert(got.nonEmpty)
    assert(got == expected)
  }
}
