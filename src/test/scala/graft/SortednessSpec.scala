package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.operators.Sortedness

class SortednessSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hand-traced monotonicity fractions; chunking skips cross-chunk pairs") {
    // ids 0..5, chunkRows=3 -> chunks {0,1,2} and {3,4,5}: 4 pairs total
    // sorted_k: fully increasing; saw_k: up-down alternation
    val df = Seq(
      (0L, 10L, 1L), (1L, 20L, 9L), (2L, 30L, 2L),
      (3L, 40L, 9L), (4L, 50L, 1L), (5L, 60L, 9L)
    ).toDF("id", "sorted_k", "saw_k")
    val m = Sortedness.profile(df, "id",
        Seq(("sorted", col("sorted_k")), ("saw", col("saw_k"))), chunkRows = 3L)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(m("sorted").getLong(1) == 4L && m("sorted").getLong(2) == 4L)
    assert(m("sorted").getLong(3) == 1000000L)
    // saw within chunks: (9>=1 ok, 2>=9 no) and (1>=9 no, 9>=1 ok) -> 2/4
    assert(m("saw").getLong(2) == 2L && m("saw").getLong(3) == 500000L)
  }

  test("equal adjacent values count as sorted (zonemaps love constant runs)") {
    val df = Seq((0L, 5L), (1L, 5L), (2L, 5L)).toDF("id", "k")
    val m = Sortedness.profile(df, "id", Seq(("k", col("k"))), chunkRows = 10L)
      .collect().head
    assert(m.getLong(2) == 2L && m.getLong(3) == 1000000L)
  }
}
