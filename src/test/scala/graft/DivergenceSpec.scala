package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Divergence

class DivergenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("identical distributions -> zero divergence") {
    val docs = Seq((1L, "s1", "x y x y"), (2L, "s2", "y x y x"))
      .toDF("doc_id", "source", "text")
    val r = Divergence.jsdBySource(docs).collect()
    assert(r.length == 1 && r(0).getLong(2) == 0L)
  }

  test("disjoint supports -> ln 2, up to the per-word half-micro quantization") {
    val docs = Seq((1L, "s1", "x y"), (2L, "s2", "u v"))
      .toDF("doc_id", "source", "text")
    val r = Divergence.jsdBySource(docs).collect()
    // each of the 4 support words contributes floor(0.5·ln2·500000 + 0.5)
    val perWord = math.floor(0.5 * math.log(2.0) * 500000.0 + 0.5).toLong
    assert(r.length == 1 && r(0).getLong(2) == 4 * perWord)
    assert(math.abs(4 * perWord - math.round(math.log(2.0) * 1e6)) <= 2,
      "disjoint JSD must sit at ln 2 nats")
  }

  test("symmetry by construction and skew ordering") {
    val docs = Seq(
      (1L, "a", "x x x y"),  // a: 3/4 x, 1/4 y
      (2L, "b", "x y y y"),  // b: 1/4 x, 3/4 y — moderate gap to a
      (3L, "c", "u u u u")   // c: disjoint from both
    ).toDF("doc_id", "source", "text")
    val m = Divergence.jsdBySource(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")),
      "one canonical row per unordered pair")
    assert(m(("a", "b")) > 0L)
    assert(m(("a", "c")) > m(("a", "b")),
      "disjoint pair must diverge more than overlapping pair")
  }
}
