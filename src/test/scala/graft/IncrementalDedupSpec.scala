package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IncrementalDedup

class IncrementalDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val corpusRows = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2L, "the quick brown fox jumps over the lazy dog today"))

  test("every decision class lands with its deterministic match id") {
    val corpus = corpusRows.toDF("doc_id", "text")
    val batch = Seq(
      (10L, corpusRows(0)._2),                                     // corpus copy
      (11L, "totally novel words one two three four five six"),    // fresh
      (12L, "totally novel words one two three four five six"),    // batch copy
      (13L, "the quick brown fox jumps over the lazy dog tonight") // near of 2
    ).toDF("doc_id", "text")
    val got = IncrementalDedup.admit(batch, corpus)
      .as[(Long, String, Option[Long])].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (10L, "corpus_exact", Some(1L)),
      (11L, "kept", None),
      (12L, "batch_exact", Some(11L)),
      (13L, "corpus_near", Some(2L))))
  }

  test("corpus match outranks batch grouping (two batch copies of a corpus doc)") {
    val corpus = corpusRows.toDF("doc_id", "text")
    val batch = Seq((20L, corpusRows(1)._2), (21L, corpusRows(1)._2))
      .toDF("doc_id", "text")
    val got = IncrementalDedup.admit(batch, corpus)
      .as[(Long, String, Option[Long])].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (20L, "corpus_exact", Some(2L)),
      (21L, "corpus_exact", Some(2L))))
  }

  test("hot shingles past the corpus posting cap generate no candidates") {
    // every corpus doc shares the same boilerplate sentence; cap 1 drops
    // all of its shingles, so a batch doc made ONLY of boilerplate keeps
    val boiler = "subscribe to our newsletter for updates and offers now"
    val corpus = (1L to 3L).map(i => (i, s"$boiler unique$i")).toDF("doc_id", "text")
    val got = IncrementalDedup
      .admit(Seq((30L, boiler)).toDF("doc_id", "text"), corpus,
        maxCorpusPostings = 1)
      .as[(Long, String, Option[Long])].collect()
    assert(got.toSeq == Seq((30L, "kept", None)))
    // with a permissive cap the same doc is a near-duplicate of corpus 1
    val loose = IncrementalDedup
      .admit(Seq((30L, boiler)).toDF("doc_id", "text"), corpus,
        maxCorpusPostings = 20, minJaccard = 0.5)
      .as[(Long, String, Option[Long])].collect()
    assert(loose.toSeq == Seq((30L, "corpus_near", Some(1L))))
  }

  test("deterministic across partitionings") {
    val r = new scala.util.Random(7)
    val words = Vector("data", "spark", "dedup", "corpus", "batch", "hash",
      "token", "model", "train", "eval", "alpha", "beta")
    def txt() = (1 to 12).map(_ => words(r.nextInt(words.size))).mkString(" ")
    val corpus = (1L to 40L).map(i => (i, txt())).toDF("doc_id", "text")
    val batchRows = (100L to 140L).map(i => (i, txt()))
    val a = IncrementalDedup
      .admit(batchRows.toDF("doc_id", "text").repartition(1), corpus.repartition(1))
      .as[(Long, String, Option[Long])].collect().toSet
    val b = IncrementalDedup
      .admit(batchRows.toDF("doc_id", "text").repartition(13), corpus.repartition(7))
      .as[(Long, String, Option[Long])].collect().toSet
    assert(a == b && a.size == 41)
  }
}
