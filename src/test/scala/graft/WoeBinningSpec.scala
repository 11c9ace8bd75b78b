package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.WoeBinning

class WoeBinningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // bin A: 30 pos / 10 neg, bin B: 10 pos / 30 neg, bin C: 5 pos / 0 neg
  private def binned = (
    Seq.fill(30)(("A", true)) ++ Seq.fill(10)(("A", false)) ++
      Seq.fill(10)(("B", true)) ++ Seq.fill(30)(("B", false)) ++
      Seq.fill(5)(("C", true))
  ).toDF("bin", "is_pos")

  test("hand-traced WoE and IV: symmetric bins, zero-cell bin reports NULL/0") {
    val rows = WoeBinning.woeTable(binned).collect()
      .map(r => r.getString(0) -> r).toMap
    // totals: 45 pos, 40 neg
    val ln = math.log((30.0 / 45.0) / (10.0 / 40.0))
    def f6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(rows("A").getDouble(3) == f6(ln))
    assert(rows("A").getLong(4) ==
      math.floor(((30.0 / 45.0) - (10.0 / 40.0)) * ln * 1e6 + 0.5).toLong)
    val lnB = math.log((10.0 / 45.0) / (30.0 / 40.0))
    assert(rows("B").getDouble(3) == f6(lnB))
    assert(rows("B").getLong(4) > 0L, "a separating bin contributes positive IV")
    assert(rows("C").isNullAt(3) && rows("C").getLong(4) == 0L,
      "zero-cell bin must report NULL woe and zero IV, not vanish")
  }

  test("information value sums the defined bins exactly") {
    val iv = WoeBinning.informationValue(binned).collect()(0)
    assert(iv.getLong(0) == 3L && iv.getLong(1) == 2L)
    val table = WoeBinning.woeTable(binned).collect().map(_.getLong(4)).sum
    assert(iv.getLong(2) == table)
  }

  test("a non-separating feature has IV ~ 0") {
    val flat = (Seq.fill(20)(("A", true)) ++ Seq.fill(20)(("A", false)) ++
      Seq.fill(20)(("B", true)) ++ Seq.fill(20)(("B", false))).toDF("bin", "is_pos")
    val iv = WoeBinning.informationValue(flat).collect()(0).getLong(2)
    assert(iv == 0L, s"identical class ratios must give zero IV, got $iv")
  }
}
