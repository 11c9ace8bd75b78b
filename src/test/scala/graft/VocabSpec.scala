package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Vocab

class VocabSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ids are dense, frequency-ranked, alphabetical on ties") {
    val docs = Seq((1L, "b a b c a b"), (2L, "a c")).toDF("doc_id", "text")
    // counts: b=3, a=3, c=2 → ranks: a(3)=1, b(3)=2 (tie → alpha), c(2)=3
    val got = Vocab.build(docs).select($"word", $"n", $"token_id")
      .as[(String, Long, Int)].collect().sortBy(_._3)
    assert(got.toSeq == Seq(("a", 3L, 1), ("b", 3L, 2), ("c", 2L, 3)))
  }

  test("minCount prunes the long tail; ids stay dense") {
    val docs = Seq((1L, "a a a b b rare")).toDF("doc_id", "text")
    val got = Vocab.build(docs, minCount = 2L).select($"word", $"token_id")
      .as[(String, Int)].collect().toMap
    assert(got == Map("a" -> 1, "b" -> 2))
  }

  test("encode: ordered ids under the vocab, OOV becomes -1 and is counted") {
    val docs = Seq((1L, "b a b c a b"), (2L, "a c"), (3L, "zzz a")).toDF("doc_id", "text")
    // vocab at minCount=2: a=1, b=2, c=3 (see the ranking test); zzz pruned
    val got = Vocab.encode(docs, Vocab.build(docs, minCount = 2L))
      .select($"doc_id", $"token_ids", $"n_tokens", $"n_unk")
      .as[(Long, Seq[Long], Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((Seq(2L, 1L, 2L, 3L, 1L, 2L), 6L, 0L)))
    assert(got(2L) == ((Seq(1L, 3L), 2L, 0L)))
    assert(got(3L) == ((Seq(-1L, 1L), 2L, 1L))) // zzz is OOV
  }

  test("construction is deterministic across runs") {
    val docs = (1 to 200).map(i => (i.toLong, s"w${i % 17} w${i % 5} common"))
      .toDF("doc_id", "text")
    val a = Vocab.build(docs).collect().toSet
    val b = Vocab.build(docs).collect().toSet
    assert(a == b)
  }
}
