package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Chunker

class ChunkerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("windows start every stride; tail chunk is short; overlap repeats tokens") {
    val df = Seq((1L, "a b c d e f g")).toDF("doc_id", "text")
    val got = Chunker.chunk(df, Seq("doc_id"), "text", chunkSize = 4, overlap = 1)
      .select($"chunk_idx", $"chunk_text", $"n_chunk_tokens")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (0L, "a b c d", 4L),
      (1L, "d e f g", 4L),
      (2L, "g", 1L)))
  }

  test("zero overlap partitions the tokens exactly") {
    val df = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val got = Chunker.chunk(df, Seq("doc_id"), "text", chunkSize = 2, overlap = 0)
      .select($"chunk_text").as[String].collect().toSet
    assert(got == Set("a b", "c d", "e"))
  }

  test("empty and whitespace-only docs produce no chunks") {
    val df = Seq((1L, ""), (2L, "   "), (3L, "x")).toDF("doc_id", "text")
    val got = Chunker.chunk(df, Seq("doc_id"), "text", chunkSize = 3, overlap = 1)
      .select($"doc_id").as[Long].collect().toSeq
    assert(got == Seq(3L))
  }

  test("every token appears in ceil(span/stride) chunks; concat reconstructs with overlap") {
    val text = (1 to 23).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val rows = Chunker.chunk(df, Seq("doc_id"), "text", chunkSize = 8, overlap = 3)
      .select($"chunk_idx", $"chunk_text").as[(Long, String)].collect().sortBy(_._1)
    // stride 5: starts 0,5,10,15,20 — dropping each chunk's first `overlap`
    // tokens (after the first chunk) reconstructs the document
    val rebuilt = rows.head._2.split(" ").toSeq ++
      rows.tail.toSeq.flatMap(_._2.split(" ").drop(3).toSeq)
    assert(rebuilt == text.split(" ").toSeq)
  }

  test("plan: chunking is a zero-shuffle projection") {
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = Chunker.chunk(df, Seq("doc_id"), "text", 2, 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
