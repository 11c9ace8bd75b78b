package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SkewJoin
import graft.sources.Tables

class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted join returns exactly the plain inner join's multiset") {
    val t = Tables(spark, TestSpark.Sf0001)
    val li = t.lineitem.select($"l_orderkey", $"l_extendedprice")
    val ord = t.orders.select($"o_orderkey", $"o_orderpriority")
    val plain = li.join(ord, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"), sum($"l_extendedprice").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val salted = SkewJoin.saltedInner(li, ord, "l_orderkey", "o_orderkey", salts = 8)
      .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"), sum($"l_extendedprice").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(salted == plain)
  }

  test("hot key: per-match multiplicity is preserved, not multiplied by salts") {
    val hot = spark.range(1000).select(lit(1L).as("k"), $"id".as("payload"))
    val dim = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("dk", "tag")
    val joined = SkewJoin.saltedInner(hot, dim, "k", "dk", salts = 4)
    assert(joined.count() == 2000L) // 1000 left rows x 2 matching right rows
    assert(joined.columns.toSet == Set("k", "payload", "dk", "tag"))
  }

  test("null keys drop, like the plain inner join") {
    val l = Seq((Option.empty[Long], "x"), (Some(1L), "y")).toDF("k", "v")
    val r = Seq((Option.empty[Long], "p"), (Some(1L), "q")).toDF("dk", "w")
    assert(SkewJoin.saltedInner(l, r, "k", "dk", salts = 4).count() == 1L)
  }

  test("salt actually spreads a hot key across partitions") {
    val hot = spark.range(4000).select(lit(7L).as("k"), $"id".as("payload"))
    val dim = Seq((7L, "only")).toDF("dk", "tag")
    val joined = SkewJoin.saltedInner(hot, dim, "k", "dk", salts = 8)
    val parts = joined
      .select(org.apache.spark.sql.functions.spark_partition_id().as("p"))
      .distinct().count()
    assert(parts >= 4, s"hot key should land on several reducers, got $parts")
  }

  test("plan: shuffle keys include the salt") {
    val t = Tables(spark, TestSpark.Sf0001)
    val p = SkewJoin.saltedInner(
      t.lineitem.select($"l_orderkey", $"l_extendedprice"),
      t.orders.select($"o_orderkey", $"o_orderpriority"),
      "l_orderkey", "o_orderkey", salts = 8)
      .queryExecution.executedPlan.toString
    assert(p.contains("_lsalt") && p.contains("_rsalt"),
      s"join keys must carry the salt:\n$p")
  }
}
