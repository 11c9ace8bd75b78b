package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.operators.RangePlanner

class RangePlannerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("full-sample plan on a uniform key is exactly balanced") {
    val df = spark.range(0, 1000).select(col("id").as("k"), col("id").as("rid"))
    val plan = RangePlanner.plan(df, "k", "rid", numPartitions = 4, sampleMod = 1)
      .collect().sortBy(_.getLong(0))
    assert(plan.length == 4)
    assert(plan.forall(_.getLong(1) == 250L), "uniform key -> 250 rows per range")
    assert(plan.forall(_.getLong(4) == 250000L))
    // ranges tile the key space: cut ranks 250/500/750 -> boundary keys
    // 249/499/749, strictly-greater assignment
    assert(plan.map(r => (r.getLong(2), r.getLong(3))).toSeq ==
      Seq((0L, 249L), (250L, 499L), (500L, 749L), (750L, 999L)))
  }

  test("duplicate boundary values collapse instead of splitting a hot key") {
    // 900 of 1000 rows share key 5: several cut ranks land on the same
    // boundary value, which must collapse to ONE planned split
    val df = (Seq.fill(900)(5L) ++ (100L to 199L)).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("k", "rid")
    val plan = RangePlanner.plan(df, "k", "rid", numPartitions = 4, sampleMod = 1)
      .collect().sortBy(_.getLong(0))
    assert(plan.length < 4, "collapsed boundaries must yield fewer ranges")
    val hot = plan.head
    assert(hot.getLong(1) == 900L && hot.getLong(2) == 5L && hot.getLong(3) == 5L,
      "the hot key stays in one range")
  }

  test("corpus-scale sample fails loudly instead of single-partition sorting") {
    val big = spark.range(0, 1100000).select(col("id").as("k"), col("id").as("rid"))
    val e = intercept[IllegalArgumentException] {
      RangePlanner.plan(big, "k", "rid", numPartitions = 4, sampleMod = 1)
    }
    assert(e.getMessage.contains("sampleMod"))
  }
}
