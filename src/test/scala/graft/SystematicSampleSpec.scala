package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SystematicSample

class SystematicSampleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(ws: Seq[Long]) =
    ws.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "n_chars")

  test("total multiplicity equals the threshold count n (±1 integer-step effects)") {
    try {
      val ws = Seq.fill(200)(37L) ++ Seq.fill(100)(11L)
      val total = ws.sum
      val n = 25
      val step = total / n
      val off = step / 2
      val expected = if (total > off) (total - off + step - 1) / step else 0L
      val hits = SystematicSample.ppsHits(docs(ws), "n_chars", "doc_id", n)
        .agg(sum(col("n_hits"))).collect()(0).getLong(0)
      assert(hits == expected && math.abs(hits - n) <= 1, s"hits=$hits expected=$expected")
    } finally spark.catalog.clearCache() // PrefixSum persists its ranged frame
  }

  test("PPS guarantees: weight >= step is always drawn; multiplicity ~ weight/step") {
    try {
      // one giant doc (half the corpus) among many small ones
      val ws = 5000L +: Seq.fill(100)(50L)
      val total = ws.sum // 10000
      val n = 20 // step = 500
      val out = SystematicSample.ppsHits(docs(ws), "n_chars", "doc_id", n)
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      assert(out.contains(0L), "a doc spanning many steps must be sampled")
      assert(out(0L) >= 5000L / 500 - 1 && out(0L) <= 5000L / 500 + 1,
        s"multiplicity must track weight/step: ${out(0L)}")
    } finally spark.catalog.clearCache()
  }

  test("degenerate corpus (total weight < targetN) samples nothing, not a crash") {
    try {
      val out = SystematicSample.ppsHits(docs(Seq(1L, 2L)), "n_chars", "doc_id", 100)
      assert(out.count() == 0L)
    } finally spark.catalog.clearCache()
  }

  test("deterministic given the corpus: two runs identical") {
    try {
      val ws = (1 to 150).map(_.toLong * 7L)
      val a = SystematicSample.ppsHits(docs(ws), "n_chars", "doc_id", 30)
        .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
      val b = SystematicSample.ppsHits(docs(ws), "n_chars", "doc_id", 30)
        .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
      assert(a == b && a.nonEmpty)
    } finally spark.catalog.clearCache()
  }
}
