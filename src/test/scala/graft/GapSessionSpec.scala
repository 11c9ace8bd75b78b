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
}
