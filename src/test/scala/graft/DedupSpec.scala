package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while the sun sets behind distant hills and " +
      "rivers flow gently through the quiet valley toward the open sea"

  private def corpus = Seq(
    (1L, base),
    (2L, base), // exact dup of 1
    (3L, base.replace("quick", "swift")), // near dup of 1
    (4L, "completely different text about spark catalyst optimizer rules and tungsten codegen"),
    (5L, "another unrelated document discussing minhash banding and locality sensitive hashing")
  ).toDF("doc_id", "text")

  test("exact dedup groups copies and keeps min-id representative") {
    val groups = Dedup.exactGroups(corpus).collect()
    assert(groups.length == 4)
    val dupGroup = groups.find(_.getAs[Long]("n_copies") == 2).get
    assert(dupGroup.getAs[Long]("doc_id") == 1L)
    assert(Dedup.dropExactDuplicates(corpus).count() == 4)
  }

  test("minhash LSH finds planted exact and near duplicates") {
    val pairs = Dedup.minhashPairs(corpus, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((1L, 2L))) // exact dup: jaccard 1.0
    assert(keys.contains((1L, 3L)) || keys.contains((2L, 3L))) // near dup
    assert(pairs.find(p => p._1 == 1L && p._2 == 2L).get._3 == 1.0)
    // unrelated docs must not pair at 0.5
    assert(!keys.exists(p => p._1 == 4L || p._2 == 4L || p._2 == 5L))
  }

  test("minhashPairsMd5: planted dups found, verified jaccard exact, unrelated excluded") {
    try {
      val pairs = Dedup.minhashPairsMd5(corpus, threshold = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      val keys = pairs.map(p => (p._1, p._2)).toSet
      assert(keys.contains((1L, 2L)))
      assert(pairs.find(p => p._1 == 1L && p._2 == 2L).get._3 == 1.0)
      assert(!keys.exists(p => p._1 >= 4L || p._2 >= 4L))
      // every emitted pair must equal its brute-force exact Jaccard
      val sh = corpus.select($"doc_id", Dedup.shingles($"text").as("sh"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
      for ((a, b, j) <- pairs) {
        val inter = sh(a).intersect(sh(b)).size
        val union = sh(a).union(sh(b)).size
        assert(j == inter.toDouble / union)
      }
    } finally spark.catalog.clearCache() // the operator persists its shingle scan
  }

  test("simhashPairsMd5: COMPLETE recall — output equals brute-force all-pairs hamming <= 3") {
    try {
      import graft.functions.{TextFunctions => TF}
      val got = Dedup.simhashPairsMd5(corpus, maxHamming = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val sigs = corpus
        .select($"doc_id", TF.md548Tokens($"text").as("_hs"))
        .select($"doc_id", TF.simhash48FromHashes($"_hs").as("sig"))
        .collect().map(r => r.getLong(0) -> r.getLong(1))
      val want = (for {
        (a, sa) <- sigs; (b, sb) <- sigs if a < b
        h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
      } yield (a, b, h)).toSet
      assert(got == want && want.contains((1L, 2L, 0)))
      intercept[IllegalArgumentException](Dedup.simhashPairsMd5(corpus, maxHamming = 4))
    } finally spark.catalog.clearCache() // the operator persists its signature frame
  }

  test("dropNearDuplicates removes higher-id members of dup groups") {
    val kept = Dedup.dropNearDuplicates(corpus, threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(1L) && kept.contains(4L) && kept.contains(5L))
    assert(!kept.contains(2L) && !kept.contains(3L))
  }

  test("simhash: identical texts hash equal, near texts within small hamming") {
    val sigs = corpus.select($"doc_id", Dedup.simhash($"text").as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L))
    val hammingNear = java.lang.Long.bitCount(sigs(1L) ^ sigs(3L))
    val hammingFar = java.lang.Long.bitCount(sigs(1L) ^ sigs(4L))
    assert(hammingNear < hammingFar)
    val pairs = Dedup.simhashPairs(corpus, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 2L)))
  }

  test("simhashPairs: maxBucketSize bounds the degenerate-corpus join") {
    // 1,000 identical docs → every chunk bucket holds all 1,000 rows; the
    // uncapped self-join would materialize ~2M pairs across 4 chunks.
    val boiler = spark.range(1000)
      .select($"id".as("doc_id"), lit("the same boilerplate text every time").as("text"))
    assert(Dedup.simhashPairs(boiler, maxBucketSize = 100).count() == 0L)
    // cap above corpus size → all pairs come back (identical docs: hamming 0)
    val small = spark.range(20)
      .select($"id".as("doc_id"), lit("the same boilerplate text every time").as("text"))
    assert(Dedup.simhashPairs(small, maxBucketSize = 100).count() == 20L * 19 / 2)
  }

  test("hot-shingle stoplist: boilerplate stops dominating signatures") {
    // 40 docs share an identical header; two (100, 101) also share a unique
    // body. Header shingles appear in every doc; body shingles in 2/42.
    val header = "terms of service apply to all content in this repository"
    val body = "the quick brown fox jumps over the lazy dog tonight"
    val docs = ((0 until 40).map(i => (i.toLong, s"$header unique tail number $i")) ++
      Seq((100L, s"$header $body"), (101L, s"$header $body"))).toDF("doc_id", "text")

    val hot = Dedup.hotShingleHashes(docs, maxDocFrac = 0.5)
    assert(hot.nonEmpty, "header shingles must exceed the 50% doc-frequency bar")

    // signatures WITH the stoplist separate boilerplate-only docs; the true
    // dup pair still agrees on every lane (their non-stop shingles match)
    val sigs = docs.select($"doc_id",
      Dedup.minhashSignature($"text", stopHashes = hot).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(100L) == sigs(101L))
    assert(sigs(0L) != sigs(1L), "distinct tails must differ once boilerplate is stopped")

    // end-to-end: same verified pairs, stoplist or not (pruning is
    // candidate-side only; exact-Jaccard verification is unchanged)
    def keys(d: org.apache.spark.sql.DataFrame) =
      d.select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val without = keys(Dedup.minhashPairs(docs, threshold = 0.8))
    val withStop = keys(Dedup.minhashPairs(docs, threshold = 0.8,
      stopShingleDocFrac = Some(0.5)))
    assert(withStop.contains((100L, 101L)))
    assert(withStop.subsetOf(without), "stoplist may only prune candidates, never add")
  }

  test("native shingle kernel matches the columnar spelling") {
    val texts = Seq("", "one two", "a b c", "the quick brown fox the quick brown fox",
      "x y z x y z w")
    val df = texts.toDF("text").select(
      Dedup.shingles($"text", 3).as("native"),
      Dedup.shinglesColumnar($"text", 3).as("columnar"))
    df.collect().foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), s"mismatch for ${r}")
    }
  }

  test("jaccard on shingle arrays: exact values") {
    val df = Seq(("a b c d", "a b c d"), ("a b c d", "x y z w")).toDF("t1", "t2")
    val j = df.select(
      Dedup.jaccard(Dedup.shingles($"t1", 2), Dedup.shingles($"t2", 2)).as("j")
    ).as[Double].collect()
    assert(j(0) == 1.0 && j(1) == 0.0)
  }
}
