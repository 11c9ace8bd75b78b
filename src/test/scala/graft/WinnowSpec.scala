package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Winnow
import graft.sources.Tables

class WinnowSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Independent naive winnowing (Schleimer 2003 Fig. 5 semantics): every
    * window's min hash, rightmost position on ties — no packed keys, no
    * window functions, a different md5 route (java MessageDigest).
    */
  private def naiveFps(text: String, k: Int = 5, w: Int = 8): Set[(Long, Long)] = {
    val s = text.toLowerCase.replaceAll("[^a-z0-9]", "")
    if (s.length < k) return Set.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = (1 to (s.length - k + 1)).map { p =>
      val hex = md.digest(s.substring(p - 1, p - 1 + k).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex.substring(0, 8), 16), p.toLong)
    }
    (w to hs.length).map { j =>
      hs.slice(j - w, j).minBy { case (h, p) => (h, -p) }
    }.toSet
  }

  test("fingerprints match an independent naive replica on real docs") {
    val docs = Tables(spark, TestSpark.Sf0001).documents
      .filter($"doc_id" < 20).select($"doc_id", $"text")
    val expected = docs.collect().map { r =>
      r.getLong(0) -> naiveFps(r.getString(1))
    }.toMap
    val got = Winnow.fingerprints(docs).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) => id -> rows.map(r => (r.getLong(1), r.getLong(2))).toSet }
    assert(got.keySet == expected.filter(_._2.nonEmpty).keySet)
    got.foreach { case (id, fps) => assert(fps == expected(id), s"doc $id") }
  }

  test("guarantee holds across 50 contexts: any 12-char shared run is detected") {
    // w + k - 1 = 12 normalized chars guarantees a FULL window of shared
    // grams, so the window minimum is a shared gram in both docs — sweep
    // contexts to show it's structural, not a lucky fixture
    (0 until 50).foreach { salt =>
      val shared = s"run${salt}pad$salt".take(12).padTo(12, 'z').mkString
      val a = s"aa${salt}xq $shared tailone$salt"
      val b = s"bb${salt}mn $shared othertwo$salt"
      assert((naiveFps(a).map(_._1) & naiveFps(b).map(_._1)).nonEmpty, s"salt $salt")
    }
  }

  test("guarantee: a shared >= w+k-1 char run yields a shared fingerprint hash") {
    // the 12-char run "commonmiddle" embedded in unrelated contexts
    val a = "xq1zv common middle 9rkt unrelated tail alpha"
    val b = "totally different head COMMON-MIDDLE other end"
    val fa = naiveFps(a).map(_._1)
    val fb = naiveFps(b).map(_._1)
    assert((fa & fb).nonEmpty)
    // and the distributed path agrees
    val df = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val pairs = Winnow.candidatePairs(Winnow.fingerprints(df), minShared = 1).collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
  }

  test("fingerprint density is near the 2/(w+1) expectation") {
    val docs = Tables(spark, TestSpark.Sf0001).documents.select($"doc_id", $"text")
    val fps = Winnow.fingerprints(docs).count().toDouble
    val grams = docs
      .select(length(Winnow.normalize($"text")).as("l"))
      .agg(sum(greatest($"l" - 4, lit(0)))).collect()(0).getLong(0).toDouble
    val density = fps / grams
    assert(density > 0.1 && density < 0.4, s"density $density") // 2/9 ≈ 0.22
  }

  test("candidatePairs recovers planted prefix copies and caps hot hashes") {
    val docs = Tables(spark, TestSpark.Sf0001).documents.select($"doc_id", $"text")
    val planted = docs.filter($"doc_id".isin(2, 5, 8))
      .select((-$"doc_id").as("doc_id"), substring($"text", 1, 200).as("text"))
    val pairs = Winnow.candidatePairs(Winnow.fingerprints(docs.unionByName(planted)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (k <- Seq(2L, 5L, 8L)) assert(pairs.contains((-k, k)), s"missing (-$k, $k)")
    // a cap of 1 drops every hash shared by >= 2 docs -> no pairs at all
    val capped = Winnow.candidatePairs(
      Winnow.fingerprints(docs.unionByName(planted)), minShared = 1, maxBucketSize = 1)
    assert(capped.count() == 0)
  }
}
