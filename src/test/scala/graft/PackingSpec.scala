package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Packing

class PackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("offsets, sequence assignment, and straddle detection per shard") {
    val docs = Seq(
      (1L, "en", "a b c"), //  en: 3 tokens, offset 0,  seq 0
      (2L, "en", "d e f g"), // en: 4 tokens, offset 3,  seq 0, straddles (3..6 crosses 4)
      (3L, "en", "h"), //       en: 1 token,  offset 7,  seq 1
      (4L, "de", "x y") //      de: own stream, offset 0, seq 0
    ).toDF("doc_id", "lang", "text")
    val got = Packing.packingIndex(docs, seqLen = 4)
      .select($"doc_id", $"n_tokens", $"start_offset", $"seq_idx", $"straddles")
      .as[(Long, Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 3L, 0L, 0L, false)))
    assert(got(2L) == ((2L, 4L, 3L, 0L, true)))
    assert(got(3L) == ((3L, 1L, 7L, 1L, false)))
    assert(got(4L) == ((4L, 2L, 0L, 0L, false)))
  }

  test("empty docs occupy no space and never straddle") {
    val docs = Seq((1L, "en", ""), (2L, "en", "a b")).toDF("doc_id", "lang", "text")
    val got = Packing.packingIndex(docs, seqLen = 4)
      .select($"doc_id", $"n_tokens", $"start_offset", $"straddles")
      .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 0L, 0L, false)))
    assert(got(2L) == ((2L, 2L, 0L, false)))
  }

  test("shards are independent: one exchange on the shard key") {
    val docs = Seq((1L, "en", "a")).toDF("doc_id", "lang", "text")
    val plan = Packing.packingIndex(docs, seqLen = 4)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }
}
