package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LineDedup

class LineDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 4 docs: "BOILER" in 3 distinct docs; "unique N" lines are per-doc;
  // doc 4 repeats its own line twice (within-doc, NOT boilerplate)
  private def docs = Seq(
    (1L, "unique one\nBOILER\nmore one"),
    (2L, "BOILER\nunique two"),
    (3L, "unique three\n  BOILER  "), // trimmed key must match
    (4L, "same line\nsame line")
  ).toDF("doc_id", "text")

  test("frequentLines counts DISTINCT documents on trimmed keys") {
    val freq = LineDedup.frequentLines(LineDedup.lines(docs), minDocs = 3L)
      .as[(String, Long)].collect().toMap
    assert(freq.size == 1)
    assert(freq.values.head == 3L) // BOILER in docs 1,2,3 (doc 3 padded)
    // the within-doc duplicate never reaches minDocs=2 either
    val freq2 = LineDedup.frequentLines(LineDedup.lines(docs), minDocs = 2L)
      .as[(String, Long)].collect().toMap
    assert(freq2.size == 1)
  }

  test("stripBoilerplate removes frequent lines, preserves order, keeps within-doc dups") {
    val out = LineDedup.stripBoilerplate(docs, minDocs = 3L)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((3L, 1L, "unique one\nmore one")))
    assert(out(2L) == ((2L, 1L, "unique two")))
    assert(out(3L) == ((2L, 1L, "unique three")))
    assert(out(4L) == ((2L, 0L, "same line\nsame line")))
  }

  test("a fully-boilerplate document keeps an empty clean_text") {
    val d = docs.unionByName(Seq((5L, "BOILER")).toDF("doc_id", "text"))
    val out = LineDedup.stripBoilerplate(d, minDocs = 3L)
      .filter($"doc_id" === 5L).as[(Long, Long, Long, String)].collect()(0)
    assert(out == ((5L, 1L, 1L, "")))
  }

  test("empty lines are never boilerplate") {
    val d = Seq(
      (1L, "a\n\nx"), (2L, "b\n\ny"), (3L, "c\n\nz"), (4L, "d\n\nw")
    ).toDF("doc_id", "text")
    val out = LineDedup.stripBoilerplate(d, minDocs = 2L)
      .agg(sum($"n_dropped")).as[Long].collect()(0)
    assert(out == 0L)
  }
}
