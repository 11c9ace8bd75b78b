package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LengthBuckets
import graft.sources.Tables

class LengthBucketsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docsOf(lens: Seq[Int]): org.apache.spark.sql.DataFrame =
    lens.zipWithIndex.map { case (n, i) => (i.toLong, Seq.fill(n)("w").mkString(" ")) }
      .toDF("doc_id", "text")

  test("hand-computed DP: the {1,2}|{10,11} split beats both alternatives") {
    // 10 docs each of token lengths 1, 2, 10, 11; B=2:
    // split after 2 pads 10+10=20; after 1 pads 0+100; after 10 pads 170+0
    val lens = Seq.fill(10)(1) ++ Seq.fill(10)(2) ++ Seq.fill(10)(10) ++ Seq.fill(10)(11)
    val out = LengthBuckets.optimalBuckets(docsOf(lens), b = 2)
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq((1, 2L, 20L, 30L, 10L), (2, 11L, 20L, 210L, 10L)))
  }

  test("bucket stats are self-consistent and cover the corpus") {
    val docs = Tables(spark, TestSpark.Sf0001).documents
    val out = LengthBuckets.optimalBuckets(docs, b = 4).collect()
    assert(out.length == 4)
    assert(out.map(_.getLong(2)).sum == docs.count())
    out.foreach { r =>
      assert(r.getLong(4) == r.getLong(1) * r.getLong(2) - r.getLong(3))
      assert(r.getLong(4) >= 0L)
    }
    // hi_len strictly increasing across buckets
    val his = out.sortBy(_.getInt(0)).map(_.getLong(1))
    assert(his.zip(his.tail).forall { case (a, b) => a < b })
  }

  test("DP beats the equal-count quartile baseline on the real corpus") {
    val docs = Tables(spark, TestSpark.Sf0001).documents
    val dpCost = LengthBuckets.optimalBuckets(docs, b = 4).collect().map(_.getLong(4)).sum
    // baseline: quartile boundaries by doc count over the sorted lengths
    val lens = docs.select(graft.functions.TextFunctions.tokenCount($"text").cast("long"))
      .collect().map(_.getLong(0)).sorted
    val n = lens.length
    val cuts = Seq(n / 4, n / 2, 3 * n / 4, n)
    val base = cuts.zip(0 +: cuts.dropRight(1)).map { case (hi, lo) =>
      val seg = lens.slice(lo, hi)
      if (seg.isEmpty) 0L else seg.max * seg.length - seg.sum
    }.sum
    assert(dpCost <= base, s"dp $dpCost vs quartiles $base")
  }
}
