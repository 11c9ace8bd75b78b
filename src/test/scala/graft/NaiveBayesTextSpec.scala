package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.NaiveBayesText

class NaiveBayesTextSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // train (id % 5 != 0): two clean classes; holdout (id % 5 == 0): one doc
  // per class plus an all-unseen-words doc
  private def docs = Seq(
    (1L, "a", "apple apple apple"),
    (2L, "a", "apple apple apple"),
    (3L, "b", "banana banana banana"),
    (4L, "b", "banana banana banana"),
    (5L, "a", "apple"),
    (10L, "b", "banana"),
    (15L, "a", "kiwi kiwi")
  ).toDF("doc_id", "lang", "text")

  test("separable classes classify; unseen-word doc falls back to the prior tie-break") {
    val m = NaiveBayesText.confusion(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // id 5 (true a) -> apple evidence -> a; id 15 (true a, all unseen) ->
    // equal priors, equal scores -> class-asc tie-break -> a
    assert(m(("a", "a")) == 2L)
    assert(m(("b", "b")) == 1L)
    assert(m.values.sum == 3L)
  }

  test("hand-traced score margin: the apple doc prefers class a by the smoothed ratio") {
    // P(apple|a) = (6+1)/(6+2), P(apple|b) = (0+1)/(6+2); priors equal.
    // score_a - score_b = lnE6(7) - lnE6(1) = lnE6(7) > 0 (denoms equal);
    // verified through the argmax rather than by exposing the scores:
    // flipping the holdout text to banana must flip the prediction.
    val flipped = docs.withColumn("text",
      org.apache.spark.sql.functions.when(
        org.apache.spark.sql.functions.col("doc_id") === 5L,
        org.apache.spark.sql.functions.lit("banana")).otherwise(
        org.apache.spark.sql.functions.col("text")))
    val m = NaiveBayesText.confusion(flipped).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m(("a", "b")) == 1L, "the banana-holding a-doc must be predicted b")
  }

  test("empty-token holdout docs still get a prediction (prior only)") {
    val withEmpty = docs.union(Seq((20L, "b", "   ")).toDF("doc_id", "lang", "text"))
    val m = NaiveBayesText.confusion(withEmpty)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m.values.sum == 4L, "the whitespace-only doc must not vanish")
  }
}
