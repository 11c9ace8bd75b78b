package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EditDistance

class EditDistanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(
      pairs: Seq[(Long, Long)],
      docs: Seq[(Long, String)]): Map[(Long, Long), (Long, Double)] =
    EditDistance.verify(pairs.toDF("id1", "id2"), docs.toDF("doc_id", "text"))
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap

  test("classic distances and normalization") {
    val docs = Seq(1L -> "kitten", 2L -> "sitting", 3L -> "kitten")
    val res = run(Seq(1L -> 2L, 1L -> 3L), docs)
    assert(res(1L -> 2L) == ((3L, 0.428571))) // 3 / 7
    assert(res(1L -> 3L) == ((0L, 0.0)))
  }

  test("empty texts: identical empties are distance 0, not a crash") {
    val docs = Seq(1L -> "", 2L -> "", 3L -> "abc")
    val res = run(Seq(1L -> 2L, 1L -> 3L), docs)
    assert(res(1L -> 2L) == ((0L, 0.0)))
    assert(res(1L -> 3L) == ((3L, 1.0)))
  }

  test("only candidate pairs are scored — no all-pairs blowup") {
    val docs = (1L to 50L).map(i => i -> s"text number $i")
    val res = run(Seq(1L -> 2L), docs)
    assert(res.size == 1)
  }

  test("a one-character template edit scores near zero normalized") {
    val base = "the quick brown fox jumps over the lazy dog " * 5
    val docs = Seq(1L -> base, 2L -> base.replaceFirst("quick", "quack"))
    val res = run(Seq(1L -> 2L), docs)
    assert(res(1L -> 2L)._1 == 1L)
    assert(res(1L -> 2L)._2 < 0.01)
  }
}
