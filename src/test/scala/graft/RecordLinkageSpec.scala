package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RecordLinkage
import graft.operators.RecordLinkage.Field

class RecordLinkageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def aSide = Seq(
    (1L, "alice", 0, "AUTO", 100.00),
    (2L, "bob", 0, "AUTO", 500.00),
    (3L, "carol", 1, "AUTO", 100.00)
  ).toDF("a_id", "a_name", "nationkey", "mktsegment", "a_acctbal")

  private def bSide = Seq(
    (11L, "alice", 0, "AUTO", 100.75), // name + bal agree -> match
    (12L, "bobx", 0, "AUTO", 500.10), // typo, bal agrees -> review
    (13L, "alice", 0, "AUTO", 9999.0) // name agrees, bal off -> review
  ).toDF("b_id", "b_name", "nationkey", "mktsegment", "b_acctbal")

  private def fields = Seq(
    Field("name", 2400L, -1800L) -> (col("a_name") === col("b_name")),
    Field("bal", 1200L, -1000L) ->
      (abs(RecordLinkage.cents(col("a_acctbal")) - RecordLinkage.cents(col("b_acctbal"))) <= 100L))

  test("hand-traced scores and three-way decisions") {
    val scored = RecordLinkage.classify(
      RecordLinkage.score(
        RecordLinkage.blockPairs(aSide, bSide, Seq("nationkey", "mktsegment")), fields),
      upperMilli = 3000L, lowerMilli = -1000L)
    val got = scored.select("a_id", "b_id", "score_milli", "decision")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getString(3)))).toMap
    // carol (a_id=3, nation 1) never meets the nation-0 block: 2x3 pairs
    assert(got.size == 6 && !got.keySet.exists(_._1 == 3L))
    assert(got((1L, 11L)) == (3600L, "match")) // both fields agree
    assert(got((2L, 12L)) == (-600L, "review")) // typo name, bal within $1
    assert(got((2L, 13L)) == (-2800L, "nonmatch")) // nothing agrees
    // name agreement with the balance far off -> the other review pattern
    assert(got((1L, 13L)) == (1400L, "review"))
  }

  test("cents comparator is exact at the $1 boundary") {
    // 100.00 vs 101.00 = 100 cents -> agree; vs 101.01 = 101 -> disagree
    val df = Seq((100.00, 101.00), (100.00, 101.01)).toDF("x", "y")
      .select(abs(RecordLinkage.cents(col("x")) - RecordLinkage.cents(col("y"))).as("d"))
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(100L, 101L))
  }

  test("oversized blocks are dropped whole (bounded join, the LSH cap economics)") {
    val bigA = (1 to 50).map(i => (i.toLong, s"n$i", 0, "AUTO", i.toDouble))
      .toDF("a_id", "a_name", "nationkey", "mktsegment", "a_acctbal")
    val pairs = RecordLinkage.blockPairs(bigA, bSide, Seq("nationkey", "mktsegment"),
      maxBlockSize = 10)
    assert(pairs.count() == 0L) // a-side block of 50 > cap 10 -> dropped
    val ok = RecordLinkage.blockPairs(bigA, bSide, Seq("nationkey", "mktsegment"),
      maxBlockSize = 50)
    assert(ok.count() == 150L)
  }

  test("multi-pass blocking dominates single-pass: candidacy and recall never lower") {
    val single = SparkEntry.queries("q_linkage_quality")(spark, TestSpark.Sf0001).collect()(0)
    val multi = SparkEntry.queries("q_linkage_multipass")(spark, TestSpark.Sf0001).collect()(0)
    // single: (n_truth, n_cand_truth, ..., recall_e6 @ 6); multi: (n_truth,
    // n_candidates, n_cand_truth, n_match, n_match_true, n_review, recall_e6)
    assert(multi.getLong(0) == single.getLong(0)) // same truth set
    assert(multi.getLong(2) >= single.getLong(1), "pass 2 can only ADD candidates")
    assert(multi.getLong(6) >= single.getLong(6), "recall must not drop")
    // the name-digit-prefix pass is typo- and segment-insensitive: on this
    // fixture every plant re-enters candidacy
    assert(multi.getLong(2) == multi.getLong(0), multi.toString)
  }

  test("q_linkage_quality invariants: unique names make match precision exactly 1") {
    val row = SparkEntry.queries("q_linkage_quality")(spark, TestSpark.Sf0001).collect()(0)
    val (nTruth, nCand, nMatch, nMatchTrue) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    assert(nCand <= nTruth) // blocking can only lose truth pairs
    assert(nMatchTrue == nMatch && row.getLong(5) == (if (nMatch == 0) 0L else 1000000L))
    assert(nMatch <= nCand)
  }
}
