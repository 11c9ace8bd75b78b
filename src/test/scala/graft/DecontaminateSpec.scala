package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Decontaminate

class DecontaminateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val bench = Seq(
    (100L, "the quick brown fox jumps over the lazy dog")
  ).toDF("doc_id", "text")

  test("a training doc quoting the benchmark is flagged; unrelated docs are not") {
    val train = Seq(
      (1L, "we show that the quick brown fox jumps far"), // 3 shared shingles
      (2L, "completely different words entirely here now"),
      (3L, "the quick brown fox jumps over the lazy dog indeed") // near-copy
    ).toDF("doc_id", "text")
    val got = Decontaminate.overlaps(train, bench, minShared = 3)
      .select($"doc_id", $"bench_id", $"n_shared")
      .as[(Long, Long, Long)].collect().toSet
    assert(got.map(_._1) == Set(1L, 3L))
    // doc 1: "the quick brown","quick brown fox","brown fox jumps"
    assert(got.find(_._1 == 1L).get._3 == 3L)
    // doc 3 contains all 7 benchmark shingles
    assert(got.find(_._1 == 3L).get._3 == 7L)
  }

  test("overlapFraction: closed-form fractions, clean docs report 0.0") {
    val train = Seq(
      (1L, "we show that the quick brown fox jumps far"), // 3 of 6 shingles hit
      (2L, "completely different words entirely here now"), // clean
      (3L, "the quick brown fox jumps over the lazy dog") // full containment
    ).toDF("doc_id", "text")
    val got = Decontaminate.overlapFraction(train, bench)
      .select($"doc_id", $"n_shingles", $"n_hit", $"contamination_frac")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // doc 1: 9 tokens -> 7 distinct shingles; 3 appear in the benchmark
    assert(got(1L) == ((1L, 7L, 3L, 0.428571)))
    assert(got(2L)._3 == 0L && got(2L)._4 == 0.0)
    // doc 3 is the benchmark text: every shingle hits
    assert(got(3L)._4 == 1.0)
  }

  test("Bloom prefilter path returns the identical overlap table") {
    // 60 training docs (3 contaminated at different overlap levels) so the
    // prefilter actually discards most (doc, shingle) rows before the join
    val train = ((1L to 57L).map(i => (i, s"filler words number $i about data systems and sorting here")) ++
      Seq(
        (58L, "we show that the quick brown fox jumps far"),
        (59L, "the quick brown fox jumps over the lazy dog indeed"),
        (60L, "lazy dog sleeping near the quick brown fox today"))).toDF("doc_id", "text")
    for (minShared <- Seq(1, 3)) {
      val exact = Decontaminate.overlaps(train, bench, minShared)
        .as[(Long, Long, Long)].collect().toSet
      val bloom = Decontaminate.overlapsViaBloom(train, bench, minShared,
        expectedShingles = 1000L)
        .as[(Long, Long, Long)].collect().toSet
      assert(bloom == exact && exact.nonEmpty, s"minShared=$minShared")
    }
  }

  test("clean() drops exactly the flagged docs") {
    val train = Seq(
      (1L, "we show that the quick brown fox jumps far"),
      (2L, "completely different words entirely here now")
    ).toDF("doc_id", "text")
    val kept = Decontaminate.clean(train, bench, minShared = 3)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(2L))
  }

  test("sourceOverlap counts distinct shared shingles per source pair, no self pairs") {
    val docs = Seq(
      (1L, "a", "the quick brown fox jumps high"),
      (2L, "b", "the quick brown fox jumps low"),  // shares 3 shingles with a
      (3L, "b", "the quick brown cat sits"),        // adds 1 more shared ("the quick brown")
      (4L, "c", "entirely different content here now")
    ).toDF("doc_id", "source", "text")
    val got = Decontaminate.sourceOverlap(docs)
      .as[(String, String, Long)].collect().toSet
    // a∩b distinct shingles: "the quick brown", "quick brown fox",
    // "brown fox jumps" -> 3 (doc 3's repeat of "the quick brown" is
    // already counted once); c shares nothing
    assert(got == Set(("a", "b", 3L)))
  }

  test("threshold is respected (below minShared survives)") {
    val train = Seq((1L, "the quick brown cat sat still")).toDF("doc_id", "text")
    // shares only "the quick brown"
    assert(Decontaminate.overlaps(train, bench, minShared = 2).count() == 0)
    assert(Decontaminate.overlaps(train, bench, minShared = 1).count() == 1)
  }
}
