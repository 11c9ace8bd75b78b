package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions

/** TF.simhash48FromHashes vs an independent java-MD5 plain-collections
  * replica, plus the sketch property the signature exists for: near-dup
  * documents land at small Hamming distance, unrelated ones far.
  */
final class SimhashPortableSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def md548(s: String): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 12), 16)
  }

  private def naive(text: String): Long = {
    val toks = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
    val counts = new Array[Int](48)
    toks.foreach { t =>
      val h = md548(t)
      (0 until 48).foreach { j =>
        if (((h >> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
      }
    }
    (0 until 48).map(j => if (counts(j) > 0) 1L << j else 0L).sum
  }

  private def run(docs: Seq[(Long, String)]): Map[Long, Long] = {
    import spark.implicits._
    docs.toDF("doc_id", "text")
      .select(col("doc_id"), TextFunctions.md548Tokens(col("text")).as("_hs"))
      .select(col("doc_id"), TextFunctions.simhash48FromHashes(col("_hs")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private val base = "the quick brown fox jumps over the lazy dog again and again today"

  test("signatures match the independent java-MD5 replica exactly") {
    val docs = Seq(
      1L -> base,
      2L -> base.replace("fox", "cat"),
      3L -> "completely different vocabulary about spark shuffles and joins",
      4L -> "",
      5L -> "single")
    val got = run(docs)
    docs.foreach { case (id, text) => assert(got(id) === naive(text), s"doc $id") }
    assert(got(4L) === 0L)
  }

  test("near-dup close in Hamming distance, unrelated far") {
    val got = run(Seq(
      1L -> base,
      2L -> base.replace("fox", "cat"),
      3L -> "completely different vocabulary about spark shuffles and joins plus extra words here"))
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(ham(got(1L), got(2L)) < ham(got(1L), got(3L)))
    assert(ham(got(1L), got(2L)) <= 16)
  }
}
