package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Changepoint

/** Best mean-shift split vs hand-computed series. */
final class ChangepointSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** counts(i) events in hour bucket i. */
  private def series(counts: Seq[Int]) = {
    import spark.implicits._
    counts.zipWithIndex
      .flatMap { case (n, h) => (1 to n).map(k => (h.toLong * 3600 + k, 1)) }
      .toDF("s", "one")
      .select(timestamp_seconds(col("s")).as("ts"))
  }

  test("clean level shift is found at the boundary") {
    // [1,1,1,9,9,9]: split after t=3 → mb=1, ma=9, gap=8
    val r = Changepoint.bestMeanShift(series(Seq(1, 1, 1, 9, 9, 9))).collect().head
    assert(r.getLong(0) === 2L) // hour bucket of the 3rd point (0-based h=2)
    assert(r.getLong(1) === 3L)
    assert(r.getDouble(2) === 1.0)
    assert(r.getDouble(3) === 9.0)
    assert(r.getDouble(4) === 8.0)
  }

  test("tie breaks on the earlier split") {
    // symmetric [1,9,1]: splits t=1 (|1-5|=4) and t=2 (|5-1|=4) tie → t=1
    val r = Changepoint.bestMeanShift(series(Seq(1, 9, 1))).collect().head
    assert(r.getLong(1) === 1L)
    assert(r.getDouble(4) === 4.0)
  }
}
