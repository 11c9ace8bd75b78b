package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial-input totality: the text/media operators must not throw and
  * must keep their structural invariants on degenerate documents — empty,
  * whitespace-only, punctuation-only, unicode, single-char, and very long
  * inputs. The oracles only ever see the fixture corpus; this is the
  * guard for the inputs a real crawl WILL contain.
  */
class RobustnessSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val nasty = Seq(
    1L -> "",
    2L -> "   \t\n  ",
    3L -> "!!!???...,,,;;;",
    4L -> "a",
    5L -> "café naïve 日本語 emoji é́ mixed",
    6L -> ("lorem ipsum " * 2000).trim, // ~24k chars
    7L -> "UPPER lower MiXeD 123 456",
    8L -> "<p>unclosed <tag attr=\"v\" <nested>&amp;&unknown;</p>"
  )
  private def docs = nasty.toDF("doc_id", "text")

  test("winnowing: degenerate docs fingerprint without throwing; short docs drop") {
    val fps = graft.operators.Winnow.fingerprints(docs).collect()
    assert(fps.forall(r => r.getLong(1) >= 0 && r.getLong(2) >= 1))
    val ids = fps.map(_.getLong(0)).toSet
    assert(!ids.contains(1L) && !ids.contains(2L) && !ids.contains(4L),
      "docs below k normalized chars must contribute nothing")
    assert(ids.contains(6L))
  }

  test("html strip: malformed markup degrades to text, never throws") {
    val out = docs.select($"doc_id",
      graft.functions.HtmlFunctions.stripTags($"text").as("c")).collect()
    assert(out.length == nasty.length)
    val m = out.map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(1L) == "" && m(2L) == "")
    assert(m(8L).contains("unclosed") && !m(8L).contains("<p>"))
  }

  test("perceptual hash + media features: all-degenerate corpus hashes totally") {
    val media = graft.operators.Multimodal.toMediaTable(docs)
    val ph = graft.operators.Multimodal.phash(media).collect()
    assert(ph.length == nasty.length)
    ph.foreach(r => assert(r.getSeq[Int](2).forall(b => b >= 0 && b <= 0xFFFF)))
    val f = graft.operators.Multimodal.extractFeatures(media, dim = 8).collect()
    assert(f.length == nasty.length)
  }

  test("readability + distinct-n queries run on the degenerate corpus") {
    docs.createOrReplaceTempView("nasty_docs")
    val toks = graft.functions.TextFunctions.tokens($"text")
    val counts = docs.select($"doc_id", size(toks).as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(counts(1L) == 0 && counts(2L) == 0)
    assert(counts(6L) == 4000)
    // gopher gates + quality scores are total on the same frame
    val g = graft.operators.GopherFilter.gates(docs).collect()
    assert(g.length == nasty.length)
  }

  test("unimax / length-buckets reject impossible shapes loudly, not wrongly") {
    // one distinct length < b buckets: fail fast with a clear message
    val one = Seq((1L, "aa bb"), (2L, "cc dd")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      graft.operators.LengthBuckets.optimalBuckets(one, b = 4)
    }
    assert(e.getMessage.contains("distinct lengths"))
  }
}
