package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables
import graft.streaming.Replayer

class ReplayerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("replayToDirectory: batched JSON-lines, rate-limited, session-keyed") {
    val cs = Tables(spark, TestSpark.Sf0001).clickstream.limit(250)
    val dir = Files.createTempDirectory("graft-replay").toString
    val t0 = System.nanoTime()
    val n = Replayer.replayToDirectory(cs, dir, eventsPerSec = 500, batchSize = 100)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(n == 250)
    val files = Files.list(Paths.get(dir)).toArray.map(_.toString).sorted
    assert(files.length == 3) // 100 + 100 + 50
    assert(files.forall(_.endsWith(".jsonl")))
    val lines = files.flatMap(f => scala.io.Source.fromFile(f).getLines())
    assert(lines.length == 250)
    assert(lines.head.contains("\"event_type\""))
    assert(lines.head.contains("\"ingestion_time\""))
    // 250 events at 500/s → at least ~0.4s of pacing
    assert(secs >= 0.35, s"rate limiter too fast: $secs s")
    // replayed lines parse back through the streaming parser
    val parsed = graft.streaming.StreamJob.parse(
      lines.toSeq.toDF("json_str"))
    assert(parsed.count() == 250)
  }

  test("CompareSpellings harness: spellings agree, winner reported") {
    val results = graft.cli.CompareSpellings.run(spark, TestSpark.Sf0001)
    assert(results.map(_.rows).distinct.size == 1)
    assert(results.forall(_.seconds > 0))
  }
}
