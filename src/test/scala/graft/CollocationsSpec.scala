package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Collocations

/** Bigram PMI vs hand-computed counts and the closed-form expression. */
final class CollocationsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("hand-computed PMI on a tiny corpus") {
    import spark.implicits._
    // doc1: "new york new york" → bigrams (new,york)×2, (york,new)×1
    // doc2: "big apple"         → (big,apple)×1
    val df = Seq((1L, "new york new york"), (2L, "big apple"))
      .toDF("doc_id", "text")
    val got = Collocations.pmiBigrams(df, minCount = 1L).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    // unigrams: new=2, york=2, big=1, apple=1; N_bi = 3 + 1 = 4
    def pmi(cab: Long, ca: Long, cb: Long): Double =
      math.floor(math.log(cab.toDouble * 4.0 / (ca.toDouble * cb.toDouble)) * 1e6 + 0.5) / 1e6
    assert(got(("new", "york")) === ((2L, pmi(2, 2, 2))))
    assert(got(("york", "new")) === ((1L, pmi(1, 2, 2))))
    assert(got(("big", "apple")) === ((1L, pmi(1, 1, 1))))
  }

  test("minCount filters rare pairs; single-token docs contribute no bigrams") {
    import spark.implicits._
    val df = Seq((1L, "a b a b"), (2L, "z")).toDF("doc_id", "text")
    val got = Collocations.pmiBigrams(df, minCount = 2L).collect()
    assert(got.map(r => (r.getString(0), r.getString(1))).toSet === Set(("a", "b")))
  }
}
