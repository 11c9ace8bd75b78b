package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.HllReplay

/** Portable-HLL invariants on constructed sets: the linear-counting branch
  * is exact-ish at tiny cardinalities, the raw branch lands within the
  * published 3σ band (σ = 1.04/√64 ≈ 13 %) at n = 2000, the ALL row is the
  * max-merge of the group registers (never bigger than the groups' union
  * implies), and estimates are invariant to duplication (a sketch property:
  * registers only see distinct hashes).
  */
final class HllReplaySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("raw-branch estimate lands within 3 sigma at n = 2000") {
    val df = (1 to 2000).map(i => ("g", s"item$i")).toDF("g", "item")
    val rows = HllReplay.sketch(df, "item", "g")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (exact, _, estE6) = rows("g")
    assert(exact === 2000L)
    val est = estE6 / 1e6
    assert(math.abs(est - 2000.0) <= 3 * 1.04 / 8.0 * 2000.0, s"est $est")
    // ALL == the single group here
    assert(rows("ALL") === rows("g"))
  }

  test("duplication invariance: the sketch sees distinct items only") {
    val once = (1 to 300).map(i => ("g", s"x$i")).toDF("g", "item")
    val thrice = (1 to 300).flatMap(i => Seq.fill(3)(("g", s"x$i"))).toDF("g", "item")
    val a = HllReplay.sketch(once, "item", "g").collect().map(_.toSeq).toSet
    val b = HllReplay.sketch(thrice, "item", "g").collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("ALL row max-merges disjoint groups to the union estimate") {
    val df = ((1 to 400).map(i => ("a", s"u$i")) ++ (201 to 600).map(i => ("b", s"u$i")))
      .toDF("g", "item")
    val rows = HllReplay.sketch(df, "item", "g")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows("ALL")._1 === 600L) // exact distinct of the union
    // merged register occupancy dominates each group's
    assert(rows("ALL")._2 >= rows("a")._2 && rows("ALL")._2 >= rows("b")._2)
    // and the merged estimate equals a direct sketch of the union
    val union = df.select(org.apache.spark.sql.functions.lit("ALL").as("g"),
      org.apache.spark.sql.functions.col("item"))
    val direct = HllReplay.sketch(union, "item", "g")
      .filter(org.apache.spark.sql.functions.col("group_key") === "ALL")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).head
    assert(direct === rows("ALL"))
  }

  test("linear-counting branch at tiny cardinality") {
    val df = (1 to 5).map(i => ("g", s"t$i")).toDF("g", "item")
    val rows = HllReplay.sketch(df, "item", "g")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (exact, nz, estE6) = rows("g")
    assert(exact === 5L)
    // with 5 distinct hashes and 64 registers collisions are unlikely but
    // legal; linear counting ln(64/(64-nz)) is exact for the observed nz
    val expected = math.floor(64.0 * math.log(64.0 / (64 - nz)) * 1e6 + 0.5).toLong
    assert(estE6 === expected)
  }
}
