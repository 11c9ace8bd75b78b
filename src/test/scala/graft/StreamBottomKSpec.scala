package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamBottomK
import graft.streaming.StreamBottomK.{BKState, Obs, SampleRow}

/** Live bottom-k sample: exact batch parity after any arrival order and
  * batch split (monotone mergeable summary), JVM/Column md5-48 parity,
  * live wiring.
  */
final class StreamBottomKSpec extends AnyFunSuite {

  private def freshState(prev: Option[BKState] = None) = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    TestGroupState.create[BKState](
      prev.map(org.apache.spark.api.java.Optional.of[BKState])
        .getOrElse(org.apache.spark.api.java.Optional.empty[BKState]()),
      GroupStateTimeout.NoTimeout,
      0L, org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = false)
  }

  private def feed(st: org.apache.spark.sql.streaming.TestGroupState[BKState],
      k: Int, obs: Seq[Obs]): Seq[SampleRow] =
    StreamBottomK.processGroup("g", obs.iterator, st, k).toSeq

  private def naiveBottomK(members: Seq[String], k: Int): Seq[(Long, String)] =
    members.distinct.map(m => (StreamBottomK.md548(m), m)).sorted.take(k)

  test("state equals the batch bottom-k after ANY order and ANY batch split") {
    val members = (1 to 200).map(i => s"user$i")
    val expect = naiveBottomK(members, 16)
    for (order <- Seq(members, members.reverse, members.sortBy(_.hashCode))) {
      for (cut <- Seq(1, 50, 199)) {
        val (b1, b2) = order.splitAt(cut)
        val st = freshState()
        feed(st, 16, b1.map(m => Obs("g", m, m.length.toLong)))
        val st2 = freshState(Some(st.get))
        val out = feed(st2, 16, b2.map(m => Obs("g", m, m.length.toLong)))
        assert(out.map(r => (r.hk, r.member)).sorted === expect)
        assert(st2.get.hks.length === 16)
      }
    }
  }

  test("duplicate members never occupy two slots") {
    val st = freshState()
    val out = feed(st, 8,
      Seq.fill(50)(Obs("g", "dup", 1L)) ++ (1 to 3).map(i => Obs("g", s"m$i", 2L)))
    assert(out.length === 4)
    assert(out.count(_.member == "dup") === 1)
  }

  test("JVM md548 twin is bit-identical to the HashSplit column spelling") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val words = Seq("", "a", "user42", "日本語", "Brand#13", "x" * 100)
    val fromCol = words.toDF("w")
      .select(graft.operators.HashSplit.md548(col("w")).as("h"))
      .as[Long].collect().toSeq
    assert(fromCol === words.map(StreamBottomK.md548))
  }

  test("live wiring: the latest update-mode batch is the exact bottom-k") {
    val spark = TestSpark.spark
    import java.nio.file.Files
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-sbk-in")
    val checkpoint = Files.createTempDirectory("graft-sbk-cp").toString
    val members = (1 to 40).map(i => s"m$i")
    Files.write(dir.resolve("b0.csv"),
      members.map(m => s"g,$m,${m.length}").mkString("\n").getBytes)
    val raw = spark.readStream.schema("group STRING, member STRING, v LONG")
      .csv(dir.toString).as[Obs]
    val q = StreamBottomK.samples(raw, k = 8)
      .writeStream.outputMode("update").format("memory").queryName("sbk_live")
      .option("checkpointLocation", checkpoint).start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("sbk_live")
      .as[SampleRow].collect().map(r => (r.hk, r.member)).sorted.toSeq
    assert(got === naiveBottomK(members, 8))
  }
}
