package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GroupCap

class GroupCapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val df = (1 to 300).map(i => (i.toLong, s"g${i % 3}")).toDF("id", "grp")

  test("caps every group at n, small groups kept whole") {
    val capped = GroupCap.capPerGroup(df, "grp", "id", 20)
    val counts = capped.groupBy($"grp").count().as[(String, Long)].collect().toMap
    assert(counts.values.forall(_ == 20L))
    val tiny = GroupCap.capPerGroup(Seq((1L, "x")).toDF("id", "grp"), "grp", "id", 20)
    assert(tiny.count() == 1)
  }

  test("membership is deterministic and rank-consistent under tighter caps") {
    val k20 = GroupCap.capPerGroup(df, "grp", "id", 20).select($"id").as[Long].collect().toSet
    val k20b = GroupCap.capPerGroup(df, "grp", "id", 20).select($"id").as[Long].collect().toSet
    assert(k20 == k20b)
    // the 10-cap must be a subset of the 20-cap (prefix property of samp_rank)
    val k10 = GroupCap.capPerGroup(df, "grp", "id", 10).select($"id").as[Long].collect().toSet
    assert(k10.subsetOf(k20) && k10.size == 30)
  }

  test("md5 order is not id order (the draw is pseudo-random, not head-N)") {
    val kept = GroupCap.capPerGroup(df, "grp", "id", 10)
      .select($"id").as[Long].collect().toSet
    val headN = df.select($"id").as[Long].collect().sorted.take(30).toSet
    assert(kept != headN)
  }
}
