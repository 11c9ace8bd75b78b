package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CountMin

/** Count–Min invariants on constructed streams: estimates are exact when
  * the width exceeds the item cardinality (no collisions possible in any
  * row would be too strong — instead we assert the two structural
  * guarantees that hold regardless: est ≥ exact always, and est ≤ n), plus
  * collision behaviour under a deliberately tiny width.
  */
final class CountMinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val stream =
    (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c") ++ Seq("d"))
      .toDF("item")

  test("estimates dominate exact counts and never exceed n") {
    val rows = CountMin.audit(stream, "item", d = 4, w = 64, k = 10)
      .as[(String, Long, Long, Long, Boolean)].collect()
    assert(rows.length === 4)
    val n = 11L
    rows.foreach { case (_, exact, est, over, geOk) =>
      assert(geOk)
      assert(est >= exact)
      assert(est <= n)
      assert(over === est - exact)
    }
    val byItem = rows.map(r => r._1 -> r._2).toMap
    assert(byItem === Map("a" -> 5L, "b" -> 3L, "c" -> 2L, "d" -> 1L))
  }

  test("width 1 collapses every row to the full stream count") {
    // with w = 1 every item hashes to bucket 0 in every row: est = n for all
    val rows = CountMin.audit(stream, "item", d = 3, w = 1, k = 10)
      .as[(String, Long, Long, Long, Boolean)].collect()
    rows.foreach { case (_, _, est, _, _) => assert(est === 11L) }
  }

  test("counter table is bounded by d*w and sums to d*n per row-set") {
    val ctr = CountMin.counters(stream, "item", d = 4, w = 8)
      .as[(Int, Long, Long)].collect()
    assert(ctr.length <= 4 * 8)
    // each of the d rows partitions all n items: per-j counters sum to n
    ctr.groupBy(_._1).foreach { case (_, cells) =>
      assert(cells.map(_._3).sum === 11L)
    }
  }

  test("top-k ordering is count desc then item asc") {
    val top2 = CountMin.audit(stream, "item", d = 4, w = 64, k = 2)
      .as[(String, Long, Long, Long, Boolean)].collect()
      .sortBy(r => (-r._2, r._1)).map(_._1)
    assert(top2.toSeq === Seq("a", "b"))
  }
}
