package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.FdProfile

class FdProfileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // id -> city holds; city -> zip violated once (cityB maps to 2 zips)
  private def rel = Seq(
    (1L, "cityA", 10L), (2L, "cityA", 10L),
    (3L, "cityB", 20L), (4L, "cityB", 21L)
  ).toDF("id", "city", "zip")

  test("a key FD holds with strength 1; a violated FD reports its mass") {
    val m = FdProfile.profile(rel, Seq(("id", "city"), ("city", "zip")))
      .collect().map(r => r.getString(0) -> r).toMap
    val key = m("id->city")
    assert(key.getLong(1) == 4L && key.getLong(2) == 4L)
    assert(key.getLong(3) == 0L && key.getBoolean(4))
    assert(key.getLong(5) == 1000000L)
    val cz = m("city->zip")
    assert(cz.getLong(1) == 2L && cz.getLong(2) == 3L, "cityB splits into 2 zips")
    assert(cz.getLong(3) == 1L && !cz.getBoolean(4))
    assert(cz.getLong(5) == math.floor(2.0 * 1e6 / 3).toLong)
  }

  test("strength orders the tighter candidate higher") {
    // i%4 and i%3 are independent (CRT): all 12 combos appear, so
    // g->x has strength 4/12 and x->g 3/12 — fewer determinant values
    // spread over the same joint domain score lower
    val noisy = (1L to 48L).map(i => (i, s"g${i % 4}", i % 3)).toDF("id", "g", "x")
    val m = FdProfile.profile(noisy, Seq(("g", "x"), ("x", "g")))
      .collect().map(r => r.getString(0) -> r.getLong(5)).toMap
    assert(m("g->x") == 333333L && m("x->g") == 250000L)
  }
}
