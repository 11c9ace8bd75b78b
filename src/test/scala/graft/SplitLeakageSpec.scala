package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.operators.SplitLeakage

class SplitLeakageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // docs 1, 2, 5 share text X; docs 3, 4 share text Y
  private def docs = Seq(
    (1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
    (3L, "one two three four"), (4L, "one two three four"),
    (5L, "alpha beta gamma delta")
  ).toDF("doc_id", "text")

  test("pairs classify by split side; cross pairs expose the leaked test docs") {
    // train = {1, 2}; test = {3, 4, 5}
    val m = SplitLeakage.nearDupLeakage(docs, col("doc_id") <= 2L)
      .collect().map(r => r.getString(0) -> r).toMap
    // X-pairs: (1,2) train_train; (1,5), (2,5) cross; Y-pair (3,4) test_test
    assert(m("train_train").getLong(1) == 1L)
    assert(m("train_train").getLong(2) == 2L && m("train_train").getLong(3) == 0L)
    assert(m("cross").getLong(1) == 2L)
    assert(m("cross").getLong(2) == 3L)
    assert(m("cross").getLong(3) == 1L, "only doc 5's eval row is compromised")
    assert(m("test_test").getLong(1) == 1L && m("test_test").getLong(3) == 2L)
  }

  test("a leak-free split (dedup-aware grouping) reports zero cross pairs") {
    // put each clone CLUSTER on one side: X-docs train, Y-docs test
    val m = SplitLeakage.nearDupLeakage(docs,
        col("doc_id").isInCollection(Seq(1L, 2L, 5L)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!m.contains("cross"))
    assert(m("train_train") == 3L && m("test_test") == 1L)
  }
}
