package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.UnigramSegment
import graft.operators.UnigramLm

/** Unigram LM trainer: hand-checked Viterbi DP (incl. the smallest-start
  * tie-break), full-corpus segmentation round-trip under the trained
  * table, pruning/coverage invariants, determinism.
  */
final class UnigramLmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val wc = Seq(
    ("spark", 50L), ("park", 30L), ("bark", 20L), ("sparkly", 10L),
    ("stream", 25L), ("streams", 15L), ("batch", 40L), ("hatch", 5L)
  ).toDF("word", "n")

  test("viterbi DP picks the max-score path") {
    val scores = Map("ab" -> -10L, "a" -> -8L, "b" -> -3L, "abc" -> -25L, "c" -> -5L)
    val got = Seq("abc").toDF("word")
      .select(UnigramSegment.segment(col("word"), scores, 4).as("p"))
      .as[Seq[String]].head()
    // a|b|c = −16, ab|c = −15 (best), abc = −25
    assert(got === Seq("ab", "c"))
  }

  test("score ties break to the smallest start (longest last piece)") {
    val scores = Map("a" -> -5L, "aa" -> -10L)
    val got = Seq("aa").toDF("word")
      .select(UnigramSegment.segment(col("word"), scores, 4).as("p"))
      .as[Seq[String]].head()
    // a|a and aa both score −10: smallest start wins → the single piece
    assert(got === Seq("aa"))
  }

  test("uncoverable words segment to an empty array, not a crash") {
    val scores = Map("a" -> -5L)
    val got = Seq("ax").toDF("word")
      .select(UnigramSegment.segment(col("word"), scores, 4).as("p"))
      .as[Seq[String]].head()
    assert(got === Seq.empty[String])
  }

  test("round-trip: every training word re-concatenates from its pieces") {
    val table = UnigramLm.train(spark, wc).as[(String, Long, Long)].collect()
      .map { case (p, _, sc) => p -> sc }.toMap
    val bad = UnigramLm.encodeWords(wc, table)
      .select(col("word"), concat_ws("", col("pieces")).as("rt"),
        size(col("pieces")).as("np"))
      .filter(col("word") =!= col("rt") || col("np") === 0)
      .count()
    assert(bad === 0L)
  }

  test("pruning and coverage invariants") {
    val rows = UnigramLm.train(spark, wc, minCount = 2L)
      .as[(String, Long, Long)].collect()
    // every multi-char survivor cleared the prune threshold
    assert(rows.filter(_._1.length > 1).forall(_._2 >= 2L))
    // every character of the training corpus is present (coverage floor)
    val chars = rows.filter(_._1.length == 1).map(_._1).toSet
    val needed = Seq("spark", "park", "bark", "sparkly", "stream", "streams",
      "batch", "hatch").flatMap(_.toSeq).map(_.toString).toSet
    assert(needed.subsetOf(chars))
    // scores are log-probs over the pruned table: all negative, and the
    // highest-count piece is the least negative among equals-length peers
    assert(rows.forall(_._3 < 0L))
  }

  test("subword vocab and fertility agree with the trained table") {
    val table = UnigramLm.train(spark, wc).as[(String, Long, Long)].collect()
      .map { case (p, _, sc) => p -> sc }.toMap
    val sub = UnigramLm.subwordVocab(spark, wc).as[(String, Long)].collect()
    // every emitted subword is a trained piece
    assert(sub.map(_._1).toSet.subsetOf(table.keySet))
    val fert = UnigramLm.fertility(spark, wc).collect().head
    val (nWords, nPieces, nChars) =
      (fert.getLong(0), fert.getLong(1), fert.getLong(2))
    // total emitted tokens == the fertility numerator
    assert(sub.map(_._2).sum === nPieces)
    // corpus totals: Σn and Σn·len over the fixture
    assert(nWords === 195L)
    assert(nChars === Seq(("spark", 50L), ("park", 30L), ("bark", 20L),
      ("sparkly", 10L), ("stream", 25L), ("streams", 15L), ("batch", 40L),
      ("hatch", 5L)).map { case (w, n) => n * w.length }.sum)
    // at least one piece per word, at most one per char
    assert(fert.getLong(3) >= 1000000L)
    assert(fert.getLong(4) >= 1000000L)
  }

  test("deterministic across runs") {
    def run() = UnigramLm.train(spark, wc).as[(String, Long, Long)].collect().toSeq
    assert(run() === run())
  }
}
