package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.{Decontaminate, Similarity}

class SemanticDecontSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("a planted paraphrase: the shingle gate misses it, the embedding gate flags it") {
    // benchmark item reworded so NO 3-gram shingle survives, but the
    // (stubbed) embedding stays adjacent — the case the lexical
    // decontamination battery is structurally blind to
    val trainText = "the quick brown fox jumps over the lazy dog tonight"
    val benchText = "a speedy russet vulpine leaps across one sleepy hound today"
    val train = Seq((0L, trainText)).toDF("doc_id", "text")
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    val lexical = Decontaminate.overlaps(train, bench, minShared = 1)
    assert(lexical.count() == 0L, "shingle gate should see nothing")

    // same two docs in embedding space: paraphrase = tiny offset
    val v = Array.tabulate(64)(i => ((i * 37 + 11) % 100) / 100.0f - 0.5f)
    val emb = Seq(
      (0L, v.map(_.toDouble)),
      (-1L, v.map(x => x.toDouble + 0.0002))
    ).toDF("vec_id", "embedding")
    val pairs = Similarity.simhashNearDupPairs(emb)
      .filter(col("id1") < 0 && col("id2") >= 0)
      .collect()
    assert(pairs.length == 1 && pairs(0).getLong(0) == -1L
      && pairs(0).getLong(1) == 0L)
    assert(pairs(0).getDouble(2) > 0.999, s"cos ${pairs(0).getDouble(2)}")
  }

  test("q_semantic_decontaminate flags exactly the paraphrased sources on the fixture") {
    val flagged = SparkEntry.queries("q_semantic_decontaminate")(spark, TestSpark.Sf0001)
      .select($"corpus_id", $"n_bench_hits", $"cos6_max")
      .as[(Long, Long, Double)].collect()
    assert(flagged.nonEmpty)
    // every %97 source must at least hit its own paraphrase at cos ≈ 1
    val byId = flagged.map(r => r._1 -> r._3).toMap
    val nEmb = graft.sources.Tables(spark, TestSpark.Sf0001).embeddings.count()
    for (src <- 0L until nEmb by 97L)
      assert(byId.get(src).exists(_ > 0.99), s"source $src not flagged: ${byId.get(src)}")
  }

  test("q_semantic_decont_fraction: flags over corpus, fraction consistent") {
    val rows = SparkEntry.queries("q_semantic_decont_fraction")(spark, TestSpark.Sf0001)
      .as[(Int, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    for ((_, n, f, ppm) <- rows) {
      assert(f <= n)
      assert(ppm == f * 1000000L / n)
    }
    assert(rows.map(_._3).sum > 0L, "at least one flagged doc overall")
  }
}
