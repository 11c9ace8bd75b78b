package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TextFunctions => TF}

/** TF.minhash48Lanes vs an independent java-MD5 replica (lane-salted
  * minima over distinct 3-shingles, short-doc fallback), plus the sketch's
  * reason to exist: matching-lane fraction estimates shingle Jaccard.
  */
final class MinhashPortableSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Lanes = 16

  private def md548(s: String): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 12), 16)
  }

  private def shingles(text: String): Seq[String] = {
    val toks = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    if (toks.length < 3) Seq(toks.mkString(" "))
    else toks.sliding(3).map(_.mkString(" ")).toSeq.distinct
  }

  private def naive(text: String): Seq[Long] =
    (0 until Lanes).map(i => shingles(text).map(s => md548(s"$i $s")).min)

  private def run(docs: Seq[(Long, String)]): Map[Long, Seq[Long]] = {
    import spark.implicits._
    docs.toDF("doc_id", "text")
      .select(col("doc_id"), TF.tokens(col("text")).as("_toks"))
      .select(col("doc_id"), TF.shingles3(col("_toks")).as("_sh"))
      .select(col("doc_id") +: TF.minhash48Lanes(col("_sh"), Lanes): _*)
      .collect()
      .map(r => r.getLong(0) -> (1 to Lanes).map(r.getLong(_)).toSeq)
      .toMap
  }

  private val base =
    "one two three four five six seven eight nine ten eleven twelve thirteen fourteen"

  test("lane minima match the independent java-MD5 replica exactly") {
    val docs = Seq(
      1L -> base,
      2L -> "short doc",
      3L -> "",
      4L -> "a b c")
    val got = run(docs)
    docs.foreach { case (id, text) => assert(got(id) === naive(text), s"doc $id") }
  }

  test("matching-lane fraction tracks shingle Jaccard") {
    val similar = base + " fifteen" // shares most 3-shingles with base
    val unrelated = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"
    val got = run(Seq(1L -> base, 2L -> similar, 3L -> unrelated))
    def matches(a: Seq[Long], b: Seq[Long]): Int = a.zip(b).count { case (x, y) => x == y }
    assert(matches(got(1L), got(2L)) > matches(got(1L), got(3L)))
    assert(matches(got(1L), got(3L)) === 0) // disjoint shingle sets
  }

  test("native one-pass kernel is bit-identical to the HOF spelling") {
    import spark.implicits._
    val docs = Seq(1L -> base, 2L -> "short doc", 3L -> (base + " " + base),
      4L -> "x")
    val kernel = docs.toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.expressions.Md5MinHash.lanes(
          TF.shingles3(TF.tokens(col("text"))), Lanes).as("_mh"))
      .select(col("doc_id") +:
        (0 until Lanes).map(i =>
          org.apache.spark.sql.functions.element_at(col("_mh"), i + 1)): _*)
      .collect()
      .map(r => r.getLong(0) -> (1 to Lanes).map(r.getLong(_)).toSeq)
      .toMap
    val hof = run(docs)
    assert(kernel === hof)
    docs.foreach { case (id, text) => assert(kernel(id) === naive(text)) }
  }
}
