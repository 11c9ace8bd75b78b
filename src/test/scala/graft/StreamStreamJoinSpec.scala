package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamStreamJoin

class StreamStreamJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // (user, id, epoch_s): views and purchases with in- and out-of-window pairs
  private val views = Seq((1L, 10L, 1000L), (1L, 11L, 5000L), (2L, 20L, 1000L), (3L, 30L, 1000L))
  private val buys = Seq((1L, 100L, 1500L), (1L, 101L, 5100L), (2L, 200L, 4000L), (3L, 300L, 900L))
  // window 1800 s: (10,100) lag 500, (11,101) lag 100; user 2's buy is 3000 s
  // after the view (out of window), user 3's buy precedes the view
  private val expected = Set((1L, 10L, 100L, 500000000L), (1L, 11L, 101L, 100000000L))

  private def vdf(rows: Seq[(Long, Long, Long)], idName: String, tsName: String) =
    rows.toDF("user_id", idName, "s")
      .select($"user_id", col(idName), timestamp_seconds($"s").as(tsName))

  test("batch twin: interval semantics, inclusive bounds, exact micro lags") {
    val out = StreamStreamJoin.attributed(
      vdf(views, "view_id", "view_ts"), vdf(buys, "buy_id", "buy_ts"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(out == expected)
  }

  test("streaming execution: symmetric hash join, parity with the batch twin") {
    val vDir = Files.createTempDirectory("graft-ssj-v")
    val bDir = Files.createTempDirectory("graft-ssj-b")
    val cp = Files.createTempDirectory("graft-ssj-cp").toString
    Files.write(vDir.resolve("v.csv"),
      views.map(r => s"${r._1},${r._2},${r._3}").mkString("\n").getBytes)
    Files.write(bDir.resolve("b.csv"),
      buys.map(r => s"${r._1},${r._2},${r._3}").mkString("\n").getBytes)
    def stream(dir: java.nio.file.Path, idName: String, tsName: String) =
      spark.readStream.schema(s"user_id LONG, $idName LONG, s LONG").csv(dir.toString)
        .select($"user_id", col(idName), timestamp_seconds($"s").as(tsName))
    val joined = StreamStreamJoin.attributed(
      stream(vDir, "view_id", "view_ts"), stream(bDir, "buy_id", "buy_ts"))
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("ssj_out").option("checkpointLocation", cp).start()
    try {
      q.processAllAvailable()
      // the real stream-stream join operator, with join state on both sides
      val plan = q.lastProgress.sources.length
      assert(plan == 2, "both sides must be streaming sources")
      assert(q.lastProgress.stateOperators.nonEmpty &&
        q.lastProgress.stateOperators(0).operatorName.contains("symmetricHashJoin"),
        q.lastProgress.stateOperators.map(_.operatorName).mkString(","))
    } finally q.stop()
    val got = spark.sql("SELECT * FROM ssj_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
  }

  test("batch twin of the LEFT OUTER join: unmatched views carry nulls") {
    val out = StreamStreamJoin.attributedOuter(
      vdf(views, "view_id", "view_ts"), vdf(buys, "buy_id", "buy_ts"))
      .collect().map(r => (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    // matched views keep their buy; views 20 and 30 emit exactly once, null
    assert(out == Set((10L, 100L), (11L, 101L), (20L, -1L), (30L, -1L)))
  }

  test("streaming LEFT OUTER: watermark eviction emits the unmatched-view null row") {
    val vDir = Files.createTempDirectory("graft-ssjo-v")
    val bDir = Files.createTempDirectory("graft-ssjo-b")
    val cp = Files.createTempDirectory("graft-ssjo-cp").toString
    // batch 1: one matched pair, one unmatched view (user 2)
    Files.write(vDir.resolve("v1.csv"), "1,10,1000\n2,20,1000".getBytes)
    Files.write(bDir.resolve("b1.csv"), "1,100,1500".getBytes)
    def stream(dir: java.nio.file.Path, idName: String, tsName: String) =
      spark.readStream.schema(s"user_id LONG, $idName LONG, s LONG").csv(dir.toString)
        .select($"user_id", col(idName), timestamp_seconds($"s").as(tsName))
    val joined = StreamStreamJoin.attributedOuter(
      stream(vDir, "view_id", "view_ts"), stream(bDir, "buy_id", "buy_ts"))
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("ssjo_out").option("checkpointLocation", cp).start()
    try {
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators(0).operatorName.contains("symmetricHashJoin"))
      // the inner result is out; the unmatched view still sits in state
      assert(spark.sql("SELECT * FROM ssjo_out WHERE buy_id IS NULL").count() === 0L)
      // advance BOTH watermarks far past view_ts + window + delay; the
      // null row is emitted by state EVICTION, which can land one batch
      // after the watermark move — nudge with late rows until it appears
      var round = 0
      var nulls = 0L
      while (nulls == 0L && round < 4) {
        val t = 100000L + round * 10000L
        Files.write(vDir.resolve(s"vn$round.csv"), s"9,${90 + round},$t".getBytes)
        Files.write(bDir.resolve(s"bn$round.csv"), s"9,${900 + round},${t + 1}".getBytes)
        q.processAllAvailable()
        nulls = spark.sql("SELECT * FROM ssjo_out WHERE buy_id IS NULL AND view_id = 20").count()
        round += 1
      }
      assert(nulls === 1L,
        s"unmatched view must emit exactly one null row after eviction (rounds=$round)")
    } finally q.stop()
  }
}
