package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Memorization

class MemorizationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val corpus =
    Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text")

  type Row = (Long, Long, Long, Long, Long, Long)
  private def run(cands: Seq[(Long, String)]): Map[Long, Row] =
    Memorization.report(cands.toDF("doc_id", "text"), corpus, w = 8)
      .as[Row].collect().map(r => r._1 -> r).toMap

  test("full copy: one span covering the whole candidate, frac = 1e6") {
    val r = run(Seq((100L, "a b c d e f g h i j")))(100L)
    assert(r == ((100L, 10L, 1L, 10L, 10L, 1000000L)))
  }

  test("memorized prefix + novel tail: span stops at the copy boundary") {
    // 8 copied tokens + 3 novel: only the pos-0 window hits
    val r = run(Seq((101L, "a b c d e f g h zz zz zz")))(101L)
    assert(r == ((101L, 11L, 1L, 8L, 8L, 8L * 1000000L / 11L)))
  }

  test("interior copy: span bounds are the matched token range") {
    // 2 novel + 9 copied (tokens b..j = 9 tokens -> windows pos 2,3) + 1 novel
    val r = run(Seq((102L, "x y b c d e f g h i j z")))(102L)
    assert(r._2 == 12L && r._3 == 1L && r._4 == 9L && r._5 == 9L)
  }

  test("clean candidate reports a zero row, not absence") {
    val r = run(Seq((103L, "j i h g f e d c b a")))(103L)
    assert(r == ((103L, 10L, 0L, 0L, 0L, 0L)))
  }

  test("two separated copies merge into two spans, not one") {
    // copy(8) + 2 novel + copy(8 from the other end offset) — windows hit
    // at pos 0 and pos 10, gap of novel tokens splits the islands
    val r = run(Seq((104L, "a b c d e f g h zz zz c d e f g h i j")))(104L)
    assert(r._3 == 2L && r._4 == 16L && r._5 == 8L)
  }

  test("q_memorization on the fixture: all three planted classes behave") {
    val rows = SparkEntry.queries("q_memorization")(spark, TestSpark.Sf0001)
      .as[Row].collect()
    assert(rows.nonEmpty)
    val full = rows.filter(r => r._1 >= 3000000L && r._1 < 4000000L)
    val half = rows.filter(r => r._1 >= 4000000L && r._1 < 5000000L)
    val novel = rows.filter(_._1 >= 5000000L)
    assert(full.nonEmpty && half.nonEmpty && novel.nonEmpty)
    // a verbatim corpus copy with >= 8 tokens is fully memorized
    for (r <- full if r._2 >= 8) assert(r._6 == 1000000L, s"full-copy $r")
    // the planted novel trailer is never memorized: half-class frac < 1e6
    for (r <- half) assert(r._6 < 1000000L, s"half $r")
    // fractions are well-formed everywhere
    for (r <- rows) assert(r._6 >= 0L && r._6 <= 1000000L && r._4 <= r._2)
  }
}
