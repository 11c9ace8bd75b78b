package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.operators.CurationBias

class CurationBiasSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "g1"), (2L, "g1"), (3L, "g1"), (4L, "g1"),
    (5L, "g2"), (6L, "g2"), (7L, "g2"), (8L, "g2")
  ).toDF("doc_id", "source")

  private def flags(keep: Set[Long]) =
    docs.select(col("doc_id"), col("doc_id").isInCollection(keep).as("keep"))

  test("hand-traced rates, impact ratio, and the four-fifths flag") {
    // g1 keeps 4/4, g2 keeps 2/4 -> impact 50% -> fails four-fifths
    val m = CurationBias.selectionRates(docs, flags(Set(1L, 2L, 3L, 4L, 5L, 6L)), "source")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(m("g1").getLong(3) == 1000000L && m("g1").getLong(4) == 1000000L)
    assert(m("g1").getBoolean(5))
    assert(m("g2").getLong(3) == 500000L && m("g2").getLong(4) == 500000L)
    assert(!m("g2").getBoolean(5))
  }

  test("a group at exactly 80% of the best passes") {
    // g1 5/5... with 4-doc groups: g1 4/4 = 1e6, g2 ... 80% of 1e6 needs
    // rate 800000 -> impossible with 4 docs; use keep 4/5 vs 4/4 shape via
    // doc weights instead: 8/10 — rebuild a 10-doc fixture
    val d10 = ((1L to 10L).map(i => (i, "g1")) ++ (11L to 20L).map(i => (i, "g2")))
      .toDF("doc_id", "source")
    val f = d10.select(col("doc_id"),
      (col("doc_id") <= 10L || col("doc_id") >= 13L).as("keep")) // g1 10/10, g2 8/10
    val m = CurationBias.selectionRates(d10, f, "source")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(m("g2").getLong(4) == 800000L && m("g2").getBoolean(5))
  }

  test("nothing survives anywhere -> NULL impact, not a divide-by-zero") {
    val m = CurationBias.selectionRates(docs, flags(Set.empty), "source")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(m("g1").isNullAt(4) && m("g1").isNullAt(5))
  }
}
