package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skyline

class SkylineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // (group, id, price, size)
  private def pts = Seq(
    ("A", 1L, 10.0, 5L),  // frontier (cheapest)
    ("A", 2L, 12.0, 9L),  // frontier (bigger than everything cheaper)
    ("A", 3L, 15.0, 9L),  // dominated by 2 (same size, pricier)
    ("A", 4L, 20.0, 12L), // frontier
    ("A", 5L, 11.0, 4L),  // dominated by 1
    ("B", 6L, 1.0, 1L)    // lone point is its own frontier
  ).toDF("grp", "id", "price", "size")

  test("hand-traced per-group Pareto frontier with ranks") {
    val sky = Skyline.frontier2d(pts, "grp", "id", "price", "size")
      .collect().map(r => r.getLong(1) -> r.getLong(4)).toMap
    assert(sky == Map(1L -> 1L, 2L -> 2L, 4L -> 3L, 6L -> 1L))
  }

  test("exact duplicates collapse to the lowest id") {
    val dup = Seq(("A", 1L, 5.0, 3L), ("A", 2L, 5.0, 3L))
      .toDF("grp", "id", "price", "size")
    val ids = Skyline.frontier2d(dup, "grp", "id", "price", "size")
      .collect().map(_.getLong(1)).toSeq
    assert(ids == Seq(1L))
  }

  test("price ties: only the biggest at that price survives against cheaper rows") {
    val tie = Seq(
      ("A", 1L, 5.0, 3L), ("A", 2L, 5.0, 7L), // same price, 2 dominates 1
      ("A", 3L, 6.0, 7L)                      // dominated by 2 (pricier, same size)
    ).toDF("grp", "id", "price", "size")
    val ids = Skyline.frontier2d(tie, "grp", "id", "price", "size")
      .collect().map(_.getLong(1)).toSeq
    assert(ids == Seq(2L))
  }
}
