package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Densify

class DensifySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("spine covers each group's own span only") {
    val df = Seq((1L, 10L), (1L, 13L), (2L, 100L)).toDF("g", "b")
    val got = Densify.spine(df, "g", "b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L), (2L, 100L)))
  }

  test("densify zero-fills counts and forward-fills carried values") {
    val agg = Seq(
      (1L, 10L, 3L, Some(5.0)),
      (1L, 13L, 2L, Some(7.0)),
      (2L, 20L, 1L, None: Option[Double])
    ).toDF("g", "b", "n", "v")
    val got = Densify.densify(agg, "g", "b", counts = Seq("n"), carried = Seq("v"))
      .select($"g", $"b", $"n", $"v").as[(Long, Long, Long, Option[Double])]
      .collect().map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got((1L, 10L)) == ((3L, Some(5.0))))
    assert(got((1L, 11L)) == ((0L, Some(5.0)))) // gap: zero count, carried v
    assert(got((1L, 12L)) == ((0L, Some(5.0))))
    assert(got((1L, 13L)) == ((2L, Some(7.0)))) // refreshes at next data row
    assert(got((2L, 20L)) == ((1L, None))) // nothing to carry yet stays null
    assert(got.size == 5)
  }

  test("forwardFill leaves rows before the first non-null value null") {
    val df = Seq((1L, 1L, None: Option[Double]), (1L, 2L, Some(4.0)), (1L, 3L, None))
      .toDF("g", "b", "v")
    val got = Densify.forwardFill(df, "g", "b", Seq("v"))
      .select($"b", $"v").as[(Long, Option[Double])].collect().toMap
    assert(got == Map(1L -> None, 2L -> Some(4.0), 3L -> Some(4.0)))
  }

  test("groups are independent (no bleed across partitions of the window)") {
    val df = Seq((1L, 1L, Some(9.0)), (2L, 2L, None: Option[Double])).toDF("g", "b", "v")
    val got = Densify.forwardFill(df, "g", "b", Seq("v"))
      .select($"g", $"v").as[(Long, Option[Double])].collect().toMap
    assert(got(2L).isEmpty)
  }
}
