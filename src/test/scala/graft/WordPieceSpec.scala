package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.WordPieceSegment
import graft.operators.WordPiece

/** WordPiece greedy segmentation: longest-match-first semantics, the
  * `[UNK]` path, equivalence with an independent naive per-word replica
  * over real corpus words, round-trip + alphabet-coverage invariants.
  */
final class WordPieceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Independent naive replica of greedy longest-match-first. */
  private def naive(word: String, vocab: Set[String], maxPiece: Int): Seq[String] = {
    val out = Seq.newBuilder[String]
    var pos = 0
    while (pos < word.length) {
      val L = (math.min(maxPiece, word.length - pos) to 1 by -1).find { l =>
        val cand =
          if (pos == 0) word.substring(0, l) else "##" + word.substring(pos, pos + l)
        vocab.contains(cand)
      }.getOrElse(return Seq(WordPieceSegment.Unk))
      out += (if (pos == 0) word.substring(0, L) else "##" + word.substring(pos, pos + L))
      pos += L
    }
    out.result()
  }

  test("greedy takes the longest match at every position") {
    val vocab = Set("a", "ab", "b", "c", "##b", "##c", "##bc")
    val got = Seq("abc").toDF("word")
      .select(WordPieceSegment.segment(col("word"), vocab, 4).as("p"))
      .as[Seq[String]].head()
    // "abc" not in vocab, "ab" is -> ab | ##c (greedy, NOT a|##bc)
    assert(got === Seq("ab", "##c"))
  }

  test("a position with no matching piece yields [UNK] for the whole word") {
    val vocab = Set("a", "##b")
    val got = Seq("axb").toDF("word")
      .select(WordPieceSegment.segment(col("word"), vocab, 4).as("p"))
      .as[Seq[String]].head()
    assert(got === Seq(WordPieceSegment.Unk))
  }

  test("empty word segments to an empty array") {
    val got = Seq("").toDF("word")
      .select(WordPieceSegment.segment(col("word"), Set("a"), 4).as("p"))
      .as[Seq[String]].head()
    assert(got === Seq.empty[String])
  }

  test("kernel ≡ naive replica on every corpus training word") {
    val wc = operators.Vocab.wordCounts(
      sources.Tables(spark, TestSpark.Sf0001).documents)
    val vocab = WordPiece.vocabSet(wc)
    val rows = WordPiece.encodeWords(wc, vocab)
      .select(col("word"), col("pieces"))
      .as[(String, Seq[String])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (w, got) =>
      assert(got === naive(w, vocab, WordPiece.MaxPiece), s"word $w")
    }
  }

  test("alphabet coverage: no training word hits [UNK]; round-trip is total") {
    val wc = operators.Vocab.wordCounts(
      sources.Tables(spark, TestSpark.Sf0001).documents)
    val rt = WordPiece.roundtripReport(wc).as[(Long, Long)].head()
    assert(rt._1 > 0L && rt._1 === rt._2)
  }

  test("vocab keeps every single-char form and at most topV multi-char") {
    val wc = Seq(("spark", 50L), ("park", 30L), ("bark", 20L)).toDF("word", "n")
    val v = WordPiece.vocab(wc, topV = 3)
      .as[(String, Long)].collect().map(_._1).toSet
    // all chars of all words in both forms (initial chars only where a word
    // starts with them)
    assert(v.contains("s") && v.contains("p") && v.contains("b"))
    assert(v.contains("##a") && v.contains("##r") && v.contains("##k"))
    val multi = v.filter(p =>
      (if (p.startsWith("##")) p.length - 2 else p.length) > 1)
    assert(multi.size <= 3)
  }

  test("the training population excludes '#' and >12-char words") {
    val wc = Seq(("ok", 1L), ("has#hash", 5L), ("averyverylongword", 5L))
      .toDF("word", "n")
    val words = WordPiece.encodeWords(wc, WordPiece.vocabSet(wc))
      .select(col("word")).as[String].collect().toSet
    assert(words === Set("ok"))
  }
}
