package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RepetitionCoverage

/** Hand-traced char-coverage cases for the Gopher A1.2 gates: top-n-gram
  * coverage (with the smallest-gram tie-break), dup-n-gram position-union
  * coverage, short/empty-doc guards, and the union ≤ 1 invariant.
  */
final class RepetitionCoverageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(docs: Seq[(Long, String)]): Map[Long, Map[String, Any]] = {
    import spark.implicits._
    val df = RepetitionCoverage.gates(docs.toDF("doc_id", "text"))
    val cols = df.columns
    df.collect().map { r =>
      r.getLong(0) -> cols.zipWithIndex.map { case (c, i) => c -> r.get(i) }.toMap
    }.toMap
  }

  test("top-2-gram coverage: 'a b a b a b' is fully covered by 'a b'") {
    // 2-gram starts: ab ba ab ba ab -> top "a b" count 3, 2 token chars
    // covered 6 of sum_len 6 -> frac 1.0
    val got = run(Seq(1L -> "a b a b a b"))(1L)
    assert(got("n_words") === 6L)
    assert(got("sum_len") === 6L)
    assert(got("top2_char_frac") === 1.0)
  }

  test("top-gram tie breaks to the lexicographically smallest gram") {
    // "a b c a b c": ab:2 bc:2 ca:1 -> tie, "a b" wins; covered 2*2=4 of 6
    val got = run(Seq(1L -> "a b c a b c"))(1L)
    assert(got("top2_char_frac") === 0.666667)
  }

  test("dup-5-gram coverage is a position union, chars counted once") {
    // toks x y z x y z x y z w; dup 5-grams "x y z x y"(1,4) and
    // "y z x y z"(2,5); union of [1,5],[4,8],[2,6],[5,9] = positions 1..9
    // -> 9 covered chars of 10
    val got = run(Seq(1L -> "x y z x y z x y z w"))(1L)
    assert(got("dup5_char_frac") === 0.9)
    // 10-token doc has no duplicated 10-gram (only one start)
    assert(got("dup10_char_frac") === 0.0)
  }

  test("doc shorter than n and empty doc yield zero coverage and keep") {
    val got = run(Seq(1L -> "a b", 2L -> ""))
    assert(got(1L)("dup5_char_frac") === 0.0)
    assert(got(2L)("n_words") === 0L)
    assert(got(2L)("sum_len") === 0L)
    assert(got(2L)("reject_mask") === 0L)
    assert(got(2L)("keep") === true)
  }

  test("reject mask bits fire on the paper thresholds") {
    // 20 × "a": top2 "a a" count 19, 2 chars -> covered 38 of 20 (overlap
    // not deduped, frac > 1) -> every top gate fails; every 5..10-gram is
    // duplicated -> full coverage 20/20 -> every dup gate fails
    val got = run(Seq(1L -> Seq.fill(20)("a").mkString(" ")))(1L)
    assert(got("top2_char_frac").asInstanceOf[Double] > 1.0)
    assert(got("reject_mask") === 511L)
    assert(got("keep") === false)
  }

  test("dup coverage never exceeds 1 (union invariant) on the fixture corpus") {
    val docs = sources.Tables(spark, "/root/testdata/sf0.001").documents
    val out = RepetitionCoverage.gates(docs)
    val bad = out.filter(
      org.apache.spark.sql.functions.col("dup5_char_frac") > 1.0).count()
    assert(bad === 0L)
  }

  test("native kernel ≡ staged HOF spelling on the fixture corpus") {
    val docs = sources.Tables(spark, "/root/testdata/sf0.001").documents
    val k = RepetitionCoverage.gates(docs).collect()
      .map(r => r.getLong(0) -> r.toSeq).toMap
    val h = RepetitionCoverage.gatesHof(docs).collect()
      .map(r => r.getLong(0) -> r.toSeq).toMap
    assert(k.keySet === h.keySet)
    k.foreach { case (id, row) => assert(row === h(id), s"doc $id diverged") }
  }

  test("native kernel ≡ HOF on constructed edge docs (ties, unicode, empties)") {
    import spark.implicits._
    val docs = Seq(
      1L -> "a b c a b c",
      2L -> Seq.fill(20)("a").mkString(" "),
      3L -> "",
      4L -> "  spaced   out\ttabs\nnewlines  ",
      5L -> "CasE Case cASe case CASE case",
      6L -> "é ü é ü é ü ñ",
      7L -> "x y z x y z x y z w",
      8L -> "one two three four five six seven eight nine ten one two three four five six seven eight nine ten"
    ).toDF("doc_id", "text")
    val k = RepetitionCoverage.gates(docs).collect()
      .map(r => r.getLong(0) -> r.toSeq).toMap
    val h = RepetitionCoverage.gatesHof(docs).collect()
      .map(r => r.getLong(0) -> r.toSeq).toMap
    k.foreach { case (id, row) => assert(row === h(id), s"doc $id diverged") }
  }
}
