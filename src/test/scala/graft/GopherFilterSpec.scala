package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GopherFilter

/** Closed-form gate cases — one document per failure mode, masks traced by
  * hand against the Rae 2021 A1.1 thresholds.
  */
final class GopherFilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Boolean)] = {
    import spark.implicits._
    GopherFilter.gates(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(r.fieldIndex("reject_mask")),
          r.getBoolean(r.fieldIndex("keep")))))
      .toMap
  }

  // 60 words, mean length in [3,10], no symbols, all alphabetic, and the
  // two stops "the" and "of" — passes every gate
  private val good =
    (Seq("the", "of") ++ Seq.fill(58)("word")).mkString(" ")

  test("clean document passes all gates") {
    val got = run(Seq(1L -> good))
    assert(got(1L) === ((60L, 0L, true)))
  }

  test("short document fails only the word-count gate") {
    val short = (Seq("the", "of") ++ Seq.fill(8)("word")).mkString(" ")
    val got = run(Seq(1L -> short))
    assert(got(1L) === ((10L, 1L, false)))
  }

  test("overlong words fail the mean-word-length gate") {
    val lw = (Seq("the", "of") ++ Seq.fill(58)("pneumonoultramicroscopic")).mkString(" ")
    // mean = (3 + 2 + 58·24)/60 = 23.2 > 10
    val got = run(Seq(1L -> lw))
    assert(got(1L) === ((60L, 2L, false)))
  }

  test("hash-mark spam fails the symbol gate") {
    val hashy = good + " " + Seq.fill(10)("#tag").mkString(" ")
    // 70 words, 10 '#' symbols → 10·10 > 70
    val got = run(Seq(1L -> hashy))
    assert(got(1L)._2 === 4L)
  }

  test("numeric salad fails the alphabetic-word gate") {
    val nums = (Seq("the", "of") ++ Seq.fill(58)("12345")).mkString(" ")
    // 2/60 alphabetic < 80 %; mean word length (3+2+58·5)/60 ∈ [3,10] passes
    val got = run(Seq(1L -> nums))
    assert(got(1L) === ((60L, 8L, false)))
  }

  test("one distinct stop word is not enough (needs two)") {
    val oneStop = (Seq("the", "the") ++ Seq.fill(58)("word")).mkString(" ")
    val got = run(Seq(1L -> oneStop))
    assert(got(1L) === ((60L, 16L, false)))
  }

  test("failures OR into the mask") {
    val shortNums = Seq.fill(10)("12345").mkString(" ")
    // word count (1) + alpha (8) + stop (16) = 25; word length 5 passes
    val got = run(Seq(1L -> shortNums))
    assert(got(1L) === ((10L, 25L, false)))
  }
}
