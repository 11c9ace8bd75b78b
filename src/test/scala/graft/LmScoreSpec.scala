package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LmScore

class LmScoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val corpus = Seq((1L, "a b a b"), (2L, "a b")).toDF("doc_id", "text")

  test("hand-computed add-1 bigram log-probs on a 2-doc corpus") {
    // counts: c(a)=c(b)=3, V=2; c("a b")=3, c("b a")=1
    // P(b|a) = (3+1)/(3+2) = 0.8 ; P(a|b) = (1+1)/(3+2) = 0.4
    val byDoc = LmScore.score(corpus, corpus)
      .select($"doc_id", $"n_bigrams", $"avg_logp")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val exp1 = BigDecimal((math.log(0.8) * 2 + math.log(0.4)) / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp2 = BigDecimal(math.log(0.8))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(byDoc(1L) == ((3L, exp1)))
    assert(byDoc(2L) == ((1L, exp2)))
  }

  test("minCount pruning: pruned bigrams fall back to 0-count smoothing") {
    // c("b a")=1 < 2 → pruned; its position scores ln((0+1)/(3+2)) = ln 0.2
    val byDoc = LmScore.score(corpus, corpus, minCount = 2L)
      .select($"doc_id", $"avg_logp").as[(Long, Double)].collect().toMap
    val exp1 = BigDecimal((math.log(0.8) * 2 + math.log(0.2)) / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(byDoc(1L) == exp1)
  }

  test("scoreStateless: exact parity with the exploded+join spelling") {
    // same positions, same smoothing, same fold order — the two spellings
    // must agree bit-for-bit, not approximately
    val batch = LmScore.score(corpus, corpus, minCount = 2L)
      .select($"doc_id", $"n_bigrams", $"avg_logp")
      .as[(Long, Long, Double)].collect().toSet
    val stateless = LmScore.scoreStateless(corpus, corpus, minCount = 2L)
      .select($"doc_id", $"n_bigrams", $"avg_logp")
      .as[(Long, Long, Double)].collect().toSet
    assert(batch.nonEmpty && stateless == batch)
  }

  test("scoreStateless plan: zero shuffles — one projection, no join/agg") {
    val plan = LmScore.scoreStateless(corpus, corpus, minCount = 2L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"stateless scoring must not shuffle:\n$plan")
  }

  test("scoreStateless refuses an unpruned (unbounded-collect) LM") {
    intercept[IllegalArgumentException] {
      LmScore.scoreStateless(corpus, corpus, minCount = 1L)
    }
  }

  test("gibberish scores lower than in-distribution text") {
    val lm = Seq.tabulate(50)(i => (i.toLong, "the cat sat on the mat")).toDF("doc_id", "text")
    val probe = Seq(
      (1000L, "the cat sat on the mat"),
      (1001L, "zqx vnm wkj qpl zzv xxy")
    ).toDF("doc_id", "text")
    val got = LmScore.score(probe, lm)
      .select($"doc_id", $"avg_logp").as[(Long, Double)].collect().toMap
    assert(got(1000L) > got(1001L))
  }
}
