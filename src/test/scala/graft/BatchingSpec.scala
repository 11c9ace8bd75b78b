package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Batching

/** Closed-form padding arithmetic for both strategies, plus the property
  * the trick exists for: length-sorting never pads more than arrival
  * order.
  */
final class BatchingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def doc(n: Int): String = Seq.fill(n)("w").mkString(" ")

  private def run(lens: Seq[Int], m: Int): Map[String, (Long, Long, Long, Double)] = {
    import spark.implicits._
    val df = lens.zipWithIndex.map { case (n, i) => (i.toLong, doc(n)) }
      .toDF("doc_id", "text")
    Batching.paddingReport(df, m)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
  }

  test("hand-traced batches of 2: interleaved lengths") {
    // arrival order lengths (5,1,5,1): batches [5,1],[5,1] → padding 4+4=8
    // length order (1,1,5,5): batches [1,1],[5,5] → padding 0
    val got = run(Seq(5, 1, 5, 1), m = 2)
    assert(got("arrival") === ((2L, 12L, 8L, 0.666667d)))
    assert(got("length_sorted") === ((2L, 12L, 0L, 0.0d)))
  }

  test("short tail batch pads only its own members") {
    // m=2 over lengths (3,1,2): arrival [3,1],[2] → padding 2+0=2
    // sorted (1,2,3): [1,2],[3] → padding 1+0=1
    val got = run(Seq(3, 1, 2), m = 2)
    assert(got("arrival") === ((2L, 6L, 2L, 0.333333d)))
    assert(got("length_sorted") === ((2L, 6L, 1L, 0.166667d)))
  }

  test("length-sorting never pads more than arrival order") {
    val rnd = new scala.util.Random(11)
    val lens = Seq.fill(100)(1 + rnd.nextInt(40))
    val got = run(lens, m = 8)
    assert(got("length_sorted")._3 <= got("arrival")._3)
    assert(got("arrival")._2 === lens.map(_.toLong).sum)
  }
}
