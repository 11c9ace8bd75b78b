package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.operators.Privacy

class TClosenessSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // global bands: 0×4, 1×4. A is all-band-0 (max skew), B all-band-1,
  // C matches the global 50/50
  private def rel = Seq(
    ("A", 0L), ("A", 0L), ("A", 0L), ("A", 0L),
    ("B", 1L), ("B", 1L), ("B", 1L), ("B", 1L),
    ("C", 0L), ("C", 0L), ("C", 1L), ("C", 1L)
  ).toDF("seg", "band")

  test("hand-traced ordered EMD: skewed classes flagged, global-matching class passes") {
    val m = Privacy.tCloseness(rel, Seq("seg"), col("band"))
      .collect().map(r => r.getString(0) -> r).toMap
    // global: band0 6/12, band1 6/12. A: (1, 0) vs (0.5, 0.5) -> EMD 0.5
    assert(m("A").getLong(2) == 500000L && !m("A").getBoolean(3))
    assert(m("B").getLong(2) == 500000L && !m("B").getBoolean(3))
    assert(m("C").getLong(2) == 0L && m("C").getBoolean(3))
  }

  test("threshold is inclusive and configurable") {
    val m = Privacy.tCloseness(rel, Seq("seg"), col("band"), tThresholdE6 = 500000L)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(m("A").getBoolean(3), "t == threshold must pass")
  }

  test("degenerate and unbounded sensitive domains fail loudly") {
    val one = Seq(("A", 7L), ("B", 7L)).toDF("seg", "band")
    assert(intercept[IllegalArgumentException] {
      Privacy.tCloseness(one, Seq("seg"), col("band"))
    }.getMessage.contains("bins"))
    val wide = spark.range(0, 1001)
      .select(org.apache.spark.sql.functions.lit("A").as("seg"), col("id").as("band"))
    assert(intercept[IllegalArgumentException] {
      Privacy.tCloseness(wide, Seq("seg"), col("band"))
    }.getMessage.contains("bin the attribute"))
  }
}
