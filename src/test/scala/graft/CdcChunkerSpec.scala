package graft

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CdcChunker

class CdcChunkerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic pseudo-text: seeded so the expected boundaries are fixed
  private def mkText(seed: Int, len: Int): String = {
    val r = new scala.util.Random(seed)
    val chars = "abcdefghijklmnopqrstuvwxyz 0123456789"
    (1 to len).map(_ => chars(r.nextInt(chars.length))).mkString
  }

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  // independent driver-side replica of the whole chunking
  private def naiveChunks(text: String, w: Int, div: Int): Seq[(Int, Int, String)] = {
    val cuts = (w to text.length - 1).filter { i =>
      java.lang.Long.parseLong(md5hex(text.substring(i - w, i)).take(12), 16) % div == 0
    }
    val starts = 1 +: cuts.map(_ + 1)
    val ends = cuts :+ text.length
    starts.zip(ends).map { case (s, e) =>
      (s, e - s + 1, md5hex(text.substring(s - 1, e)))
    }
  }

  test("matches an independent md5 replica and covers the document exactly") {
    val docs = Seq((1L, mkText(7, 900)), (2L, mkText(11, 400)), (3L, mkText(13, 60)))
    val got = CdcChunker.chunks(docs.toDF("doc_id", "text"), Seq("doc_id"), "text")
      .as[(Long, Long, Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    docs.foreach { case (id, text) =>
      val exp = naiveChunks(text, 8, 64)
      val g = got(id)
      assert(g.map(_._2).sameElements(1L to g.length), s"doc $id chunk_idx gap")
      assert(
        g.map(c => (c._3.toInt, c._4.toInt, c._5)).sameElements(exp),
        s"doc $id chunks differ from replica")
      assert(g.map(_._4).sum == text.length, s"doc $id coverage")
    }
  }

  test("prefix insertion shifts but preserves every chunk after the first") {
    val base = mkText(42, 1500)
    val shifted = mkText(99, 137) + base
    val df = Seq((1L, base), (2L, shifted)).toDF("doc_id", "text")
    val byDoc = CdcChunker.chunks(df, Seq("doc_id"), "text")
      .as[(Long, Long, Long, Long, String)].collect().groupBy(_._1)
    val baseTail = byDoc(1L).sortBy(_._2).drop(1).map(_._5)
    assert(baseTail.nonEmpty, "base doc produced a single chunk — test text too short")
    val shiftedSet = byDoc(2L).map(_._5).toSet
    // every base chunk except the first (whose left edge is the doc start,
    // not a content boundary) must reappear verbatim in the shifted doc
    baseTail.foreach(h => assert(shiftedSet.contains(h), "chunk lost after prefix shift"))
  }

  test("short documents yield one whole-doc chunk") {
    val got = CdcChunker.chunks(Seq((1L, "tiny")).toDF("doc_id", "text"), Seq("doc_id"), "text")
      .as[(Long, Long, Long, Long, String)].collect()
    assert(got.toSeq == Seq((1L, 1L, 1L, 4L, md5hex("tiny"))))
  }

  test("deterministic across partitionings; expected chunk length tracks divisor") {
    val docs = (1 to 50).map(i => (i.toLong, mkText(i, 800)))
    val a = CdcChunker.chunks(docs.toDF("doc_id", "text").repartition(1),
      Seq("doc_id"), "text").as[(Long, Long, Long, Long, String)].collect().toSet
    val b = CdcChunker.chunks(docs.toDF("doc_id", "text").repartition(13),
      Seq("doc_id"), "text").as[(Long, Long, Long, Long, String)].collect().toSet
    assert(a == b && a.nonEmpty)
    // 50×800 chars at divisor 64 → ~625 boundary draws expected; the mean
    // chunk length should sit near 64 (loose 2× band — it's a hash draw)
    val meanLen = a.toSeq.map(_._4).sum.toDouble / a.size
    assert(meanLen > 32 && meanLen < 128, s"mean chunk length $meanLen off divisor 64")
  }
}
