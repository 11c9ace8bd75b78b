package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Mixture

class MixtureSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(sizes: Map[String, Int]) =
    sizes.toSeq.flatMap { case (s, n) => (1 to n).map(i => (s"${s}_$i", s)) }
      .toDF("doc_id", "src")

  test("uniform weights equalize sources to the smallest one") {
    val df = corpus(Map("a" -> 10, "b" -> 4, "c" -> 7))
    val kept = Mixture.rebalance(df, "src", "doc_id", Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0))
      .groupBy($"src").count().as[(String, Long)].collect().toMap
    assert(kept == Map("a" -> 4L, "b" -> 4L, "c" -> 4L))
  }

  test("non-uniform weights: binding source kept whole, others cut to ratio") {
    val df = corpus(Map("a" -> 20, "b" -> 6))
    // scale = min(20/2, 6/1) = 6 → keep a: 12, b: 6 (b binds, kept whole)
    val kept = Mixture.rebalance(df, "src", "doc_id", Map("a" -> 2.0, "b" -> 1.0))
      .groupBy($"src").count().as[(String, Long)].collect().toMap
    assert(kept == Map("a" -> 12L, "b" -> 6L))
  }

  test("sources without a weight are dropped") {
    val df = corpus(Map("a" -> 5, "x" -> 5))
    val srcs = Mixture.rebalance(df, "src", "doc_id", Map("a" -> 1.0))
      .select($"src").distinct().as[String].collect().toSeq
    assert(srcs == Seq("a"))
  }

  test("membership is deterministic for any partitioning") {
    val df = corpus(Map("a" -> 30, "b" -> 11))
    val w = Map("a" -> 1.0, "b" -> 1.0)
    val expected = Mixture.rebalance(df, "src", "doc_id", w)
      .select($"doc_id").as[String].collect().toSet
    for (p <- Seq(1, 5)) {
      val got = Mixture.rebalance(df.repartition(p), "src", "doc_id", w)
        .select($"doc_id").as[String].collect().toSet
      assert(got == expected, s"partitions=$p")
    }
  }

  test("token budgets: kept totals stay within floor(w * min(T/w)) per source") {
    val df = Seq(
      ("a1", "a", 10L), ("a2", "a", 10L), ("a3", "a", 10L), // T_a = 30
      ("b1", "b", 4L), ("b2", "b", 5L) //                      T_b = 9
    ).toDF("doc_id", "src", "n_tok")
    // uniform weights: scale = min(30, 9) = 9 → budgets a: 9, b: 9
    val kept = graft.operators.Mixture
      .rebalanceTokens(df, "src", "doc_id", "n_tok", Map("a" -> 1.0, "b" -> 1.0))
      .select($"src", $"n_tok").as[(String, Long)].collect()
    val bySrc = kept.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    // a's docs are 10 tokens each — none fits a 9-token budget; b keeps both
    assert(bySrc == Map("b" -> 9L))
    // larger budget: weights a:4, b:1 → scale = min(30/4, 9) = 7.5 → a: 30, b: 7
    val kept2 = graft.operators.Mixture
      .rebalanceTokens(df, "src", "doc_id", "n_tok", Map("a" -> 4.0, "b" -> 1.0))
      .select($"src", $"n_tok").as[(String, Long)].collect()
    val bySrc2 = kept2.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(bySrc2("a") == 30L) // binding side kept whole
    assert(bySrc2("b") <= 7L && bySrc2("b") > 0L)
  }

  test("weighted source with zero rows fails fast; opt-out drops it silently") {
    val df = corpus(Map("a" -> 5))
    val w = Map("a" -> 1.0, "ghost" -> 1.0)
    val e = intercept[Exception] {
      Mixture.rebalance(df, "src", "doc_id", w).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("zero rows")))
    val kept = Mixture.rebalance(df, "src", "doc_id", w, requireAllPresent = false)
      .groupBy($"src").count().as[(String, Long)].collect().toMap
    assert(kept == Map("a" -> 5L))
  }

  test("temperature weights flatten toward uniform as alpha drops") {
    val df = corpus(Map("big" -> 90, "small" -> 10))
    val w1 = Mixture.temperatureWeights(df, "src", 1.0)
    val w5 = Mixture.temperatureWeights(df, "src", 0.5)
    // alpha=1: ratio 9:1 (natural); alpha=0.5: sqrt ratio 3:1
    assert(math.abs(w1("big") / w1("small") - 9.0) < 1e-4)
    assert(math.abs(w5("big") / w5("small") - 3.0) < 1e-4)
    // realized mixture under alpha=0.5: scale = min(90/w_b, 10/w_s); small
    // binds and is kept whole; big gets floor(w_b*scale) = 29 (the ideal 3x
    // = 30 loses one to the 6-decimal weight rounding — floor(29.99997);
    // deterministic and engine-identical, so the oracle sees the same 29)
    val kept = Mixture.rebalance(df, "src", "doc_id", w5)
      .groupBy($"src").count().as[(String, Long)].collect().toMap
    assert(kept("small") == 10L && kept("big") == 29L)
  }

  test("quota column matches floor(w * min(n/w))") {
    val df = corpus(Map("a" -> 9, "b" -> 5, "c" -> 2))
    // weights 3:1:1 → scale = min(3, 5, 2) = 2 → quotas 6, 2, 2
    val q = Mixture.rebalance(df, "src", "doc_id", Map("a" -> 3.0, "b" -> 1.0, "c" -> 1.0))
      .select($"src", $"keep_n").distinct().as[(String, Long)].collect().toMap
    assert(q == Map("a" -> 6L, "b" -> 2L, "c" -> 2L))
  }
}
