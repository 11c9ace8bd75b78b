package graft

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.expressions.BpeMerge
import graft.operators.Bpe

class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- naive single-threaded reference (Sennrich learn_bpe semantics) ----

  private def mergeSeq(syms: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) { out += l + r; i += 2 }
      else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private def naiveBpe(words: Map[String, Long], nMerges: Int): Seq[(String, String, Long)] = {
    var vocab: Map[Vector[String], Long] =
      words.map { case (w, n) => (w.split("").toVector :+ Bpe.EndMark) -> n }
    val out = mutable.ArrayBuffer.empty[(String, String, Long)]
    var continue = true
    while (continue && out.size < nMerges) {
      val counts = mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      for ((syms, n) <- vocab; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) += n
      if (counts.isEmpty) continue = false
      else {
        val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((l, r, c))
        vocab = vocab.map { case (syms, n) => mergeSeq(syms, l, r) -> n }
      }
    }
    out.toSeq
  }

  private val SennrichCorpus =
    Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  test("merge table matches the naive reference on the classic corpus") {
    val wc = SennrichCorpus.toSeq.toDF("word", "n")
    val got = Bpe.trainMerges(wc, 10).map(m => (m.left, m.right, m.cnt))
    assert(got == naiveBpe(SennrichCorpus, 10))
    // spot-check the famous first merges: (e,s) 9 then (es,t) 9
    assert(got.take(2) == Seq(("e", "s", 9L), ("es", "t", 9L)))
  }

  test("merge table matches naive on a deep train (13+ generations)") {
    // r21: pins the deep-loop parity a checkpoint-cadence rewrite would
    // have to preserve. (A cadence of 12 was tried and REVERTED: lazy
    // mergePair chains between checkpoints change each round's plan shape,
    // so whole-stage codegen recompiles per round instead of hitting the
    // cache the constant-shape checkpointed plan gets — 5-rep A/B showed
    // the cadence ~10-15 % slower. The per-generation checkpoint stays.)
    val got = Bpe.trainMerges(SennrichCorpus.toSeq.toDF("word", "n"), 20)
      .map(m => (m.left, m.right, m.cnt))
    assert(got == naiveBpe(SennrichCorpus, 20))
    assert(got.size > 12, s"fixture must exercise a deep train, got ${got.size}")
  }

  test("PairMerge kernel: leftmost-first on overlaps, ends, no-match") {
    val df = Seq(
      Seq("a", "a", "a"),
      Seq("x", "a", "a"),
      Seq("a", "b", "a", "b"),
      Seq("z"),
      Seq[String]()
    ).toDF("syms")
    val aa = df.select(BpeMerge.mergePair($"syms", "a", "a")).as[Seq[String]].collect()
    assert(aa(0) == Seq("aa", "a") && aa(1) == Seq("x", "aa"))
    val ab = df.select(BpeMerge.mergePair($"syms", "a", "b")).as[Seq[String]].collect()
    assert(ab(2) == Seq("ab", "ab") && ab(3) == Seq("z") && ab(4) == Seq())
  }

  test("deterministic for any partitioning (tie-break on left, right)") {
    val words = Map("ab" -> 2L, "cd" -> 2L, "ce" -> 1L, "ad" -> 1L)
    val expected = naiveBpe(words, 6)
    for (p <- Seq(1, 3, 7)) {
      val wc = words.toSeq.toDF("word", "n").repartition(p)
      val got = Bpe.trainMerges(wc, 6).map(m => (m.left, m.right, m.cnt))
      assert(got == expected, s"partitions=$p")
    }
  }

  test("stops early when every word is a single symbol") {
    val wc = Seq(("ab", 1L)).toDF("word", "n")
    // ab -> a,b,</w>: merges (a,b), (ab,</w>), then no pairs remain
    val got = Bpe.trainMerges(wc, 10)
    assert(got.map(m => (m.left, m.right)) == Seq(("a", "b"), ("ab", Bpe.EndMark)))
  }

  test("minPairCount stops below the threshold") {
    val wc = Seq(("ab", 5L), ("xy", 1L)).toDF("word", "n")
    val got = Bpe.trainMerges(wc, 10, minPairCount = 3L)
    // (a,b)=5 and (ab,</w>)=5 qualify; the xy pairs at 1 do not
    assert(got.map(_.cnt).forall(_ >= 3L))
    assert(got.map(m => (m.left, m.right)) == Seq(("a", "b"), ("ab", Bpe.EndMark)))
  }

  test("encodeWords applies the merge table in rank order (matches naive)") {
    val wc = SennrichCorpus.toSeq.toDF("word", "n")
    val merges = Bpe.trainMerges(wc, 8)
    val got = Bpe.encodeWords(wc, merges)
      .select($"word", $"syms").as[(String, Seq[String])].collect().toMap
    // naive: start from chars+</w>, apply each merge greedily in order
    val expected = SennrichCorpus.keys.map { w =>
      var syms = w.split("").toVector :+ Bpe.EndMark
      merges.foreach(m => syms = mergeSeq(syms, m.left, m.right))
      w -> syms
    }.toMap
    assert(got.view.mapValues(_.toVector).toMap == expected)
    // reconstruction invariant: concatenating subwords restores word + </w>
    got.foreach { case (w, syms) => assert(syms.mkString == w + Bpe.EndMark) }
  }

  test("subwordVocab weights exploded subwords by word frequency") {
    val wc = Seq(("ab", 3L), ("ac", 2L)).toDF("word", "n")
    val merges = Seq(Bpe.Merge(0, "a", "b", 3L)) // only ab merges
    val got = Bpe.subwordVocab(wc, merges)
      .as[(String, Long)].collect().toMap
    assert(got == Map(
      "ab" -> 3L, Bpe.EndMark -> 5L, "a" -> 2L, "c" -> 2L))
  }

  test("pairCounts weights by word frequency and appends the end marker") {
    val vocab = Bpe.symbolize(Seq(("aa", 3L), ("ab", 2L)).toDF("word", "n"))
    val got = Bpe.pairCounts(vocab)
      .as[(String, String, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(got == Map(
      ("a", "a") -> 3L, ("a", "b") -> 2L,
      ("a", Bpe.EndMark) -> 3L, ("b", Bpe.EndMark) -> 2L))
  }

  test("fertility row ties out against the subword vocab and corpus sums") {
    val wc = SennrichCorpus.toSeq.toDF("word", "n")
    val merges = Bpe.trainMerges(wc, 5)
    val f = Bpe.fertility(wc, merges).collect().head
    val (nWords, nPieces, nChars) = (f.getLong(0), f.getLong(1), f.getLong(2))
    assert(nWords === SennrichCorpus.values.sum)
    assert(nChars === SennrichCorpus.map { case (w, n) => n * w.length }.sum)
    // Σ n_tokens over the full induced vocab == the fertility numerator
    val vocabTotal = Bpe.subwordVocab(wc, merges)
      .agg(sum($"n_tokens")).as[Long].head()
    assert(vocabTotal === nPieces)
    // at least one piece (the marker) per word occurrence
    assert(f.getLong(3) >= 1000000L)
  }

  test("plan: one merge step is exactly one pair-count shuffle, merge itself shuffle-free") {
    val vocab = Bpe.symbolize(Seq(("ab", 1L)).toDF("word", "n"))
    val countPlan = Bpe.pairCounts(vocab).queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(countPlan).size == 1, countPlan)
    val mergePlan = vocab.withColumn("syms", BpeMerge.mergePair($"syms", "a", "b"))
      .queryExecution.executedPlan.toString
    assert(!mergePlan.contains("Exchange"), mergePlan)
  }
}
