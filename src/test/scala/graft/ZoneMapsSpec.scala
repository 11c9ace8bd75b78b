package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ZoneMaps
import graft.operators.ZoneMaps.RangePred

/** Constructed-permutation units: exact per-file zone maps, and a layout
  * sorted on the predicate column must prune strictly more files than the
  * scrambled insertion order.
  */
final class ZoneMapsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // v = (3·id mod 8) + 1 is a permutation of 1..8: insertion order mixes
  // values across files; sorting by v packs them tight
  private lazy val df = (1L to 8L).map(id => (id, (id * 3) % 8 + 1)).toDF("id", "v")

  test("file stats: exact min/max per simulated file") {
    val full = ZoneMaps.fileStats(df, Seq("id"), 2, Seq("v"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // files in id order: {4,7}, {2,5}, {8,3}, {6,1}
    assert(full === Seq((0L, 4L, 7L), (1L, 2L, 5L), (2L, 3L, 8L), (3L, 1L, 6L)))
  }

  test("sorted layout prunes strictly more files than insertion order") {
    val got = ZoneMaps.report(
      df,
      layouts = Seq("natural" -> Seq("id"), "byv" -> Seq("v", "id")),
      fileRows = 2, statCols = Seq("v"),
      preds = Seq(RangePred("v_1_2", "v", 1L, 2L)))
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // natural files {4,7},{2,5},{3,8},{1,6}: spans intersect [1,2] for
    // files 1 and 3 → 2 pruned; byv files {1,2},{3,4},{5,6},{7,8} → 3
    assert(got("natural") === (("natural", "v_1_2", 4L, 2L, 500000L)))
    assert(got("byv") === (("byv", "v_1_2", 4L, 3L, 750000L)))
  }

  test("point predicate prunes every file not holding the value") {
    val got = ZoneMaps.report(
      df, layouts = Seq("byv" -> Seq("v", "id")), fileRows = 2,
      statCols = Seq("v"), preds = Seq(RangePred("v_point_5", "v", 5L, 5L)))
      .as[(String, String, Long, Long, Long)].head()
    assert(got === (("byv", "v_point_5", 4L, 3L, 750000L)))
  }
}
