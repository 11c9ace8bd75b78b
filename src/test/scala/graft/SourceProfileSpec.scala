package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SourceProfile

/** Per-source decile profile vs hand-assigned ntile bins. */
final class SourceProfileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("20 docs in one source → 2 per decile, ordered stats") {
    import spark.implicits._
    val df = (1L to 20L).map(i => (i, "web", i * 10L))
      .toDF("doc_id", "source", "n_chars")
    val got = SourceProfile.decileProfile(df).collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    assert(got.keySet === (1L to 10L).toSet)
    // decile 1 = chars 10,20 → mean 15; decile 10 = 190,200 → mean 195
    assert(got(1L) === ((2L, 10L, 20L, 15.0)))
    assert(got(10L) === ((2L, 190L, 200L, 195.0)))
  }

  test("sources are profiled independently") {
    import spark.implicits._
    val df = (
      (1L to 10L).map(i => (i, "a", i)) ++
        (11L to 20L).map(i => (i, "b", i * 100L)))
      .toDF("doc_id", "source", "n_chars")
    val got = SourceProfile.decileProfile(df).collect()
    assert(got.length === 20)
    assert(got.forall(_.getLong(2) == 1L))
  }
}
