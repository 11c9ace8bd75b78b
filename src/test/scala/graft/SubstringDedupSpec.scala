package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SubstringDedup

class SubstringDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // docs 1 and 2 share the 6-token run "q w e r t y"; doc 3 is unrelated
  private def corpus = Seq(
    (1L, "a b q w e r t y c d"),
    (2L, "x q w e r t y z"),
    (3L, "one two three four five six seven")
  ).toDF("doc_id", "text")

  test("windowHashes: positions and count, short docs yield none") {
    val wh = SubstringDedup.windowHashes(Seq((1L, "a b c d"), (2L, "a b")).toDF("doc_id", "text"), w = 3)
      .collect()
    assert(wh.map(_.getLong(0)).forall(_ == 1L)) // doc 2 is shorter than w
    assert(wh.map(_.getInt(1)).sorted.sameElements(Array(0, 1)))
  }

  test("duplicatedSpans: shared run merges into one maximal span per doc") {
    // w=3 over the shared 6-token run → 4 consecutive dup windows per doc,
    // merged: doc 1 tokens 2..7, doc 2 tokens 1..6
    val spans = SubstringDedup.duplicatedSpans(corpus, w = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(spans.toSet == Set((1L, 2, 7, 4L), (2L, 1, 6, 4L)))
  }

  test("duplicatedDocIds ≡ duplicatedSpans membership (span merge skipped)") {
    val fast = SubstringDedup.duplicatedDocIds(corpus, w = 3)
      .collect().map(_.getLong(0)).toSet
    val viaSpans = SubstringDedup.duplicatedSpans(corpus, w = 3)
      .select($"doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(fast == viaSpans && fast == Set(1L, 2L))
    spark.catalog.clearCache() // both paths persist their window scans
  }

  test("within-doc repetition alone is not a cross-doc span") {
    val df = Seq(
      (1L, "p q r s p q r s"), // repeats internally, shared with nobody
      (2L, "totally different words here")
    ).toDF("doc_id", "text")
    assert(SubstringDedup.duplicatedSpans(df, w = 3).count() == 0L)
  }

  test("two disjoint shared runs stay two spans") {
    val df = Seq(
      (1L, "q w e junk1 junk2 junk3 r t y"),
      (2L, "q w e other filler words r t y")
    ).toDF("doc_id", "text")
    val spans = SubstringDedup.duplicatedSpans(df, w = 3)
      .filter($"doc_id" === 1L).collect()
      .map(r => (r.getInt(1), r.getInt(2))).toSet
    assert(spans == Set((0, 2), (6, 8)))
  }

  test("removeSpans cuts exactly the span tokens; untouched docs keep their text") {
    val res = SubstringDedup.removeSpans(corpus, w = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(res(1L) == ((10, 6, md5Of("a b c d"))))
    assert(res(2L) == ((8, 6, md5Of("x z"))))
    assert(res(3L) == ((7, 0, md5Of("one two three four five six seven"))))
  }

  test("a fully-duplicated doc cleans to the empty string") {
    val df = Seq(
      (1L, "s a m e t e x t"),
      (2L, "s a m e t e x t")
    ).toDF("doc_id", "text")
    val res = SubstringDedup.removeSpans(df, w = 3)
      .collect().map(r => (r.getInt(2), r.getString(3)))
    res.foreach { case (nRemoved, h) =>
      assert(nRemoved == 8)
      assert(h == md5Of(""))
    }
  }

  test("plan: windowHashes is a zero-shuffle explode") {
    val p = SubstringDedup.windowHashes(corpus, w = 3)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"window explode must not shuffle:\n$p")
  }

  private def md5Of(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("dupNgramStats: per-source duplicated-position fractions, hand-traced") {
    // w=2 bigram positions:
    //   s1/doc1 "a b c"   → "a b", "b c"
    //   s1/doc2 "b c d"   → "b c", "c d"
    //   s2/doc3 "b c b c" → "b c", "c b", "b c"
    //   s2/doc4 "x y"     → "x y"
    // corpus totals: "b c"×4 (dup), others ×1
    // s1: 4 positions, 2 dup → 0.5 ; s2: 4 positions, 2 dup → 0.5
    val docs = Seq(
      (1L, "s1", "a b c"), (2L, "s1", "b c d"),
      (3L, "s2", "b c b c"), (4L, "s2", "x y")
    ).toDF("doc_id", "source", "text")
    val got = SubstringDedup.dupNgramStats(docs, w = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got === Map("s1" -> ((4L, 2L, 0.5d)), "s2" -> ((4L, 2L, 0.5d))))
  }

  test("dupNgramStats: a duplicate WITHIN one document counts") {
    val docs = Seq((1L, "s1", "a b a b")).toDF("doc_id", "source", "text")
    // positions: "a b", "b a", "a b" → 2 of 3 duplicated
    val got = SubstringDedup.dupNgramStats(docs, w = 2).collect()
    assert(got.length === 1)
    assert((got.head.getLong(1), got.head.getLong(2)) === ((3L, 2L)))
  }

  test("dupNgramStats: sources shorter than w vanish, no division by zero") {
    val docs = Seq((1L, "s1", "a b c"), (2L, "s2", "solo")).toDF("doc_id", "source", "text")
    val got = SubstringDedup.dupNgramStats(docs, w = 2).collect()
    assert(got.map(_.getString(0)).toSeq === Seq("s1"))
  }
}
