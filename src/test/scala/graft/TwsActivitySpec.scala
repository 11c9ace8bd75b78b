package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.TwsActivity

class TwsActivitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming transformWithState: RocksDB state, running totals, state readback") {
    val dir = Files.createTempDirectory("graft-tws-in")
    val cp = Files.createTempDirectory("graft-tws-cp").toString
    val f0 = dir.resolve("b0.csv"); val f1 = dir.resolve("b1.csv")
    Files.write(f0, "1,view\n1,click\n1,view\n2,view".getBytes)
    Files.write(f1, "1,view\n1,purchase\n3,view".getBytes)
    Files.setLastModifiedTime(f0, java.nio.file.attribute.FileTime.fromMillis(1000000L))
    Files.setLastModifiedTime(f1, java.nio.file.attribute.FileTime.fromMillis(2000000L))
    val raw = spark.readStream.schema("user_id LONG, event_type STRING")
      .option("maxFilesPerTrigger", 1).csv(dir.toString)
      .as[TwsActivity.Click]
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val q = TwsActivity.activity(raw)
      .writeStream.outputMode("update").format("memory")
      .queryName("tws_out").option("checkpointLocation", cp).start()
    try {
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.nonEmpty &&
        q.lastProgress.stateOperators(0).operatorName.contains("transformWithState"),
        q.lastProgress.stateOperators.map(_.operatorName).mkString(","))
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
    // update mode: each touched key emits its RUNNING total per batch
    val got = spark.sql("SELECT * FROM tws_out")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 3L), (2L, 1L), (1L, 5L), (3L, 1L)))

    // the Spark 4 state data source reads the final ValueState back out
    val state = spark.read.format("statestore")
      .option("stateVarName", "count").load(cp)
    val finalCounts = state.selectExpr("key.value AS user_id", "value.value AS n")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(finalCounts == Set((1L, 5L), (2L, 1L), (3L, 1L)))
  }

  // CANNOT use processAllAvailable here: with TimeMode.ProcessingTime the
  // new API reproduces the old ProcessingTimeTimeout hang —
  // TransformWithStateExec.shouldRunAnotherBatch is always true (so
  // registered timers can fire in data-less batches), the engine never
  // signals noNewData, and processAllAvailable blocks forever (reproduced
  // r18, jstack at StreamExecution.processAllAvailable). Poll the memory
  // sink against a deadline instead — the continuous empty batches are
  // exactly what lets TTL eviction and timers show up without new input.
  private def awaitRows(name: String, want: Long, timeoutMs: Long = 90000L): Unit = {
    val deadline = System.currentTimeMillis + timeoutMs
    while (spark.sql(s"SELECT * FROM tws_$name").count() < want &&
      System.currentTimeMillis < deadline) Thread.sleep(200L)
  }

  private def runSessions(
      ttlMs: Long, timerMs: Long, sleepMs: Long,
      batch1: String, batch2: String, rowsAfter2: Long,
      name: String): Set[(Long, String, Long)] = {
    val dir = Files.createTempDirectory(s"graft-tws-$name-in")
    val cp = Files.createTempDirectory(s"graft-tws-$name-cp").toString
    Files.write(dir.resolve("b0.csv"), batch1.getBytes)
    val raw = spark.readStream.schema("user_id LONG, event_type STRING")
      .csv(dir.toString).as[TwsActivity.Click]
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val q = TwsActivity.sessions(raw, ttlMs = ttlMs, timerMs = timerMs)
      .writeStream.outputMode("update").format("memory")
      .queryName(s"tws_$name").option("checkpointLocation", cp).start()
    try {
      awaitRows(name, 1L)
      Thread.sleep(sleepMs) // let the wall clock pass TTL/timer expiry
      Files.write(dir.resolve("b1.csv"), batch2.getBytes)
      awaitRows(name, rowsAfter2)
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
    spark.sql(s"SELECT * FROM tws_$name")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
  }

  test("ValueState TTL on RocksDB: the idle key's count EVICTS and restarts") {
    // ttl 800ms << 2.5s idle gap; timer far away so only TTL acts.
    // batch 1: user 1 counts to 3. After the gap, batch 2 must read the
    // state as ABSENT (exists() false) and restart at 2 — NOT reach 5.
    val got = runSessions(ttlMs = 800L, timerMs = 3600000L, sleepMs = 2500L,
      batch1 = "1,view\n1,click\n1,view", batch2 = "1,view\n1,click",
      rowsAfter2 = 2L, name = "ttl")
    assert(got.contains((1L, "update", 3L)), got.toString)
    assert(got.contains((1L, "update", 2L)), s"TTL did not evict: $got")
    assert(!got.contains((1L, "update", 5L)), s"state survived its TTL: $got")
  }

  test("processing-time timer fires in a later micro-batch with the live count") {
    // timer 500ms << 2.5s gap, TTL huge so the count survives; batch 2
    // touches only user 2, so user 1's row can ONLY come from
    // handleExpiredTimer — with its preserved count of 3.
    val got = runSessions(ttlMs = 3600000L, timerMs = 500L, sleepMs = 2500L,
      batch1 = "1,view\n1,click\n1,view", batch2 = "2,view",
      rowsAfter2 = 3L, name = "timer")
    assert(got.contains((1L, "update", 3L)), got.toString)
    assert(got.contains((2L, "update", 1L)), got.toString)
    assert(got.contains((1L, "timer", 3L)), s"timer did not fire: $got")
  }

  test("re-arming replaces the pending timer: an active key closes exactly once") {
    // key 1 arrives in TWO batches inside the timer window; registerTimer
    // ADDS to the per-key timer set, so without the deleteTimer sweep the
    // stale batch-1 timer would also fire -> a premature duplicate close
    val dir = Files.createTempDirectory("graft-tws-rearm-in")
    val cp = Files.createTempDirectory("graft-tws-rearm-cp").toString
    Files.write(dir.resolve("b0.csv"), "1,view\n1,click".getBytes)
    val raw = spark.readStream.schema("user_id LONG, event_type STRING")
      .csv(dir.toString).as[TwsActivity.Click]
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // timer long enough that batch 2 is guaranteed to land INSIDE the
    // window even on a loaded host (a stale timer that fired before the
    // re-arm would be a timing artifact, not the accumulation bug)
    val q = TwsActivity.sessions(raw, ttlMs = 3600000L, timerMs = 5000L)
      .writeStream.outputMode("update").format("memory")
      .queryName("tws_rearm").option("checkpointLocation", cp).start()
    try {
      awaitRows("rearm", 1L)
      Files.write(dir.resolve("b1.csv"), "1,view".getBytes) // inside the window
      awaitRows("rearm", 2L)
      awaitRows("rearm", 3L) // the single close after the re-armed expiry
      Thread.sleep(3000L)    // give any stale timer ample time to misfire
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
    val rows = spark.sql("SELECT * FROM tws_rearm")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val timers = rows.filter(_._2 == "timer")
    assert(timers.toSeq === Seq((1L, "timer", 3L)),
      s"expected exactly one close with the full count, got: ${rows.toSeq}")
  }

  test("event-time timer fires when the WATERMARK passes it; close clears the session") {
    // gap 5s in EVENT time, watermark delay 2s. Batch 1: user 1's events
    // end at 00:00:12 -> timer armed at 00:00:17. Nothing can fire on the
    // wall clock: only batch 2's event at 00:01:00 advances the watermark
    // to 00:00:58 > 00:00:17, which is what fires the close (with the
    // preserved count 3). Batch 3 then proves the close CLEARED the state:
    // user 1 restarts at 1, not 4.
    val dir = Files.createTempDirectory("graft-tws-evt-in")
    val cp = Files.createTempDirectory("graft-tws-evt-cp").toString
    Files.write(dir.resolve("b0.csv"),
      "1,view,1970-01-01 00:00:10\n1,click,1970-01-01 00:00:11\n1,view,1970-01-01 00:00:12".getBytes)
    val raw = spark.readStream.schema("user_id LONG, event_type STRING, ts TIMESTAMP")
      .csv(dir.toString).as[TwsActivity.StampedClick]
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val q = TwsActivity.eventSessions(raw, gapMs = 5000L, delay = "2 seconds")
      .writeStream.outputMode("update").format("memory")
      .queryName("tws_evt").option("checkpointLocation", cp).start()
    try {
      awaitRows("evt", 1L)
      // idle WALL-CLOCK time must not close an event-time session
      Thread.sleep(1500L)
      assert(spark.sql("SELECT * FROM tws_evt WHERE kind = 'close'").count() == 0L,
        "event-time timer fired without watermark progress")
      Files.write(dir.resolve("b1.csv"), "2,view,1970-01-01 00:01:00".getBytes)
      awaitRows("evt", 3L) // user 2's update + the watermark-driven close
      Files.write(dir.resolve("b2.csv"), "1,view,1970-01-01 00:02:00".getBytes)
      awaitRows("evt", 4L)
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
    val got = spark.sql("SELECT * FROM tws_evt")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got.contains((1L, "update", 3L)), got.toString)
    assert(got.contains((2L, "update", 1L)), got.toString)
    assert(got.contains((1L, "close", 3L)), s"watermark passage did not fire the timer: $got")
    assert(got.contains((1L, "update", 1L)), s"close did not clear the session state: $got")
    assert(!got.contains((1L, "update", 4L)), s"state survived its close: $got")
  }

  test("late row above watermark must not pull the close timer backwards") {
    // gap 5s, delay 2s. Batch 1: user 1 up to ts=12 -> true close at 17.
    // Batch 2: a LATE user-1 row at ts=11 (above the batch-1 watermark of
    // 10) plus a user-2 row at 18.5 -> watermark 16.5. A processor that
    // re-arms from the BATCH max would set the timer to 11+5=16 <= 16.5
    // and close EARLY, splitting the session; the fix re-arms from the
    // max ts EVER seen (12+5=17 > 16.5 -> stays open). Batch 3's user-1
    // row at 16.8 (inside the true gap window) must therefore continue
    // the SAME session to count 5, and the eventual close carries 5.
    val dir = Files.createTempDirectory("graft-tws-late-in")
    val cp = Files.createTempDirectory("graft-tws-late-cp").toString
    Files.write(dir.resolve("b0.csv"),
      "1,view,1970-01-01 00:00:10\n1,click,1970-01-01 00:00:11\n1,view,1970-01-01 00:00:12".getBytes)
    val raw = spark.readStream.schema("user_id LONG, event_type STRING, ts TIMESTAMP")
      .option("maxFilesPerTrigger", 1).csv(dir.toString).as[TwsActivity.StampedClick]
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val q = TwsActivity.eventSessions(raw, gapMs = 5000L, delay = "2 seconds")
      .writeStream.outputMode("update").format("memory")
      .queryName("tws_late").option("checkpointLocation", cp).start()
    try {
      awaitRows("late", 1L)
      Files.write(dir.resolve("b1.csv"),
        "1,late,1970-01-01 00:00:11\n2,view,1970-01-01 00:00:18.5".getBytes)
      awaitRows("late", 3L)
      Thread.sleep(1500L) // give a buggy 16s timer every chance to misfire at wm 16.5
      assert(spark.sql("SELECT * FROM tws_late WHERE kind = 'close'").count() == 0L,
        "close timer was pulled backwards by a late row")
      Files.write(dir.resolve("b2.csv"), "1,view,1970-01-01 00:00:16.8".getBytes)
      awaitRows("late", 4L)
      Files.write(dir.resolve("b3.csv"), "2,view,1970-01-01 00:01:00".getBytes)
      awaitRows("late", 6L)
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
    val got = spark.sql("SELECT * FROM tws_late")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got.contains((1L, "update", 5L)), s"late + in-gap rows must extend ONE session: $got")
    assert(got.contains((1L, "close", 5L)), s"the single close carries the full count: $got")
    assert(!got.exists(t => t._1 == 1L && t._2 == "close" && t._3 != 5L),
      s"session split by a backwards timer: $got")
  }

  test("event-time processor parity: static run rejected loudly; one-batch stream equals groupBy") {
    // Unlike TimeMode.None/ProcessingTime, the engine REFUSES to execute
    // EventTime mode as a batch query (INTERNAL_ERROR_TWS: no time values
    // in batch) — pin that contract, then take the parity through a
    // ONE-BATCH stream, where every key's rows arrive as a single group
    // exactly as a static run would deliver them.
    val ev = graft.sources.Tables(spark, TestSpark.Sf0001).events
      .selectExpr("user_id", "event_type", "CAST(ts AS TIMESTAMP) AS ts")
      .as[TwsActivity.StampedClick]
    val thrown = intercept[org.apache.spark.SparkException] {
      TwsActivity.eventSessions(ev, gapMs = 5000L, delay = "2 seconds").collect()
    }
    assert(thrown.getMessage.contains("timeMode=EventTime"), thrown.getMessage)

    val dir = Files.createTempDirectory("graft-tws-evtp-in")
    val cp = Files.createTempDirectory("graft-tws-evtp-cp").toString
    Files.write(dir.resolve("b0.csv"),
      ("1,view,1970-01-01 00:00:10\n1,click,1970-01-01 00:00:11\n" +
        "2,view,1970-01-01 00:00:12\n3,view,1970-01-01 00:00:13\n" +
        "3,click,1970-01-01 00:00:14\n1,view,1970-01-01 00:00:15").getBytes)
    val raw = spark.readStream.schema("user_id LONG, event_type STRING, ts TIMESTAMP")
      .csv(dir.toString).as[TwsActivity.StampedClick]
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val q = TwsActivity.eventSessions(raw, gapMs = 5000L, delay = "2 seconds")
      .writeStream.outputMode("update").format("memory")
      .queryName("tws_evtp").option("checkpointLocation", cp).start()
    try awaitRows("evtp", 3L)
    finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
    val updates = spark.sql("SELECT * FROM tws_evtp WHERE kind = 'update'")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(updates == Set((1L, 3L), (2L, 1L), (3L, 2L)), updates.toString)
  }

  test("static run equals a plain groupBy count (the oracled parity)") {
    val ev = graft.sources.Tables(spark, TestSpark.Sf0001).events
      .select($"user_id", $"event_type").as[TwsActivity.Click]
    val tws = TwsActivity.activity(ev).collect().map(r => (r.user_id, r.n_events)).toMap
    val batch = ev.groupByKey(_.user_id).count().collect().toMap
    assert(tws == batch)
  }
}
