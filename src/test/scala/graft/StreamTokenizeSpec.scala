package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamTokenize

/** Stateless streaming encode: batch parity (the same projection on the
  * same rows), live file-stream wiring in append mode, and the
  * uncovered-word counter.
  */
final class StreamTokenizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // table: chars a,b,c (score −5) + piece "ab" (−8): "ab" segments as
  // ["ab"] (−8 beats a|b = −10), "abc" as ["ab","c"]
  private val table = Map("a" -> -5L, "b" -> -5L, "c" -> -5L, "ab" -> -8L)

  test("per-document accounting on a batch frame") {
    val docs = Seq(
      (1L, "ab abc c"),
      (2L, "zzz ab")
    ).toDF("doc_id", "text")
    val got = StreamTokenize.pieceCounts(docs, table)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // doc 1: ab→1, abc→2, c→1 = 4 pieces; doc 2: zzz uncoverable (0), ab→1
    assert(got === Seq((1L, 3L, 4L, 0L), (2L, 2L, 1L, 1L)))
  }

  test("live wiring: the same projection runs on a file stream, append mode") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-stok-in")
    val checkpoint = Files.createTempDirectory("graft-stok-cp").toString
    Files.write(dir.resolve("b0.csv"), "1,ab abc c\n2,zzz ab".getBytes)
    val raw = spark.readStream.schema("doc_id LONG, text STRING")
      .option("sep", ",").csv(dir.toString)
    val q = StreamTokenize.pieceCounts(raw, table)
      .writeStream.outputMode("append").format("memory").queryName("stok_live")
      .option("checkpointLocation", checkpoint).start()
    try q.processAllAvailable()
    finally q.stop()
    val got = spark.sql("SELECT * FROM stok_live")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got === Seq((1L, 3L, 4L, 0L), (2L, 2L, 1L, 1L)))
  }

  test("out-of-population words count uncovered even when segmentable") {
    // "aaaaaaaaaaaab" is 13 chars — past MaxWordLen, so it was never a
    // training word. The kernel COULD segment it from chars; the meter
    // must still report it uncovered (0 pieces) to stay aligned with the
    // oracle's training-word piece population.
    val docs = Seq((1L, "ab aaaaaaaaaaaab")).toDF("doc_id", "text")
    val got = StreamTokenize.pieceCounts(docs, table)
      .as[(Long, Long, Long, Long)].collect().head
    assert(got === ((1L, 2L, 1L, 1L)))
  }

  test("trained-table integration: zero uncovered on the training corpus") {
    val wc = Seq(("spark", 5L), ("park", 3L)).toDF("word", "n")
    val t = graft.operators.UnigramLm.train(spark, wc)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    val docs = Seq((1L, "spark park spark")).toDF("doc_id", "text")
    val got = StreamTokenize.pieceCounts(docs, t)
      .as[(Long, Long, Long, Long)].collect().head
    assert(got._2 === 3L)
    assert(got._4 === 0L)
    assert(got._3 >= 3L)
  }
}
