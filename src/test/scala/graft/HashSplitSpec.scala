package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.HashSplit

class HashSplitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucket equals the first md5 hex byte; split thresholds apply") {
    // md5("hello") = 5d41... → bucket 0x5d = 93 → train
    val got = HashSplit.assign(Seq(("hello", 1L)).toDF("text", "id"), "text")
      .select($"bucket", $"split").as[(Int, String)].head()
    assert(got == ((0x5d, "train")))
  }

  test("assignment is deterministic and duplicate keys co-locate") {
    val df = Seq(("a", 1L), ("b", 2L), ("a", 3L)).toDF("text", "id")
    val splits = HashSplit.assign(df, "text")
      .select($"text", $"split").as[(String, String)].collect()
    val byText = splits.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert(byText("a").size == 1) // both copies of "a" in one split
    val again = HashSplit.assign(df, "text")
      .select($"text", $"split").as[(String, String)].collect()
    assert(splits.sorted.sameElements(again.sorted))
  }

  test("splits are exhaustive, disjoint, and roughly 80/10/10 on 20k keys") {
    val df = (1 to 20000).map(i => (s"key_$i", i.toLong)).toDF("text", "id")
    val counts = HashSplit.assign(df, "text")
      .groupBy($"split").count().as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == 20000L)
    val train = counts("train").toDouble / 20000
    val valF = counts("val").toDouble / 20000
    assert(math.abs(train - 205.0 / 256) < 0.02, s"train frac $train")
    assert(math.abs(valF - 25.0 / 256) < 0.02, s"val frac $valF")
  }

  test("zero-shuffle projection") {
    val plan = HashSplit.assign(Seq(("x", 1L)).toDF("text", "id"), "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("group k-fold: every fold in range, same key always same fold, groups intact") {
    import org.apache.spark.sql.functions._
    val df = (1L to 500L).flatMap(u => Seq((u, "a"), (u, "b"))).toDF("u", "tag")
      .select($"u", $"tag", HashSplit.fold($"u", 5).as("fold"))
    val folds = df.select("fold").distinct().as[Int].collect().sorted
    assert(folds.forall(f => f >= 0 && f < 5))
    assert(folds.length === 5) // 500 users hit every fold
    // leak-free: both rows of each user carry one fold
    val perUser = df.groupBy("u").agg(countDistinct("fold").as("nf"))
      .filter($"nf" > 1).count()
    assert(perUser === 0L)
    // md5-derived, not value-derived: fold of key 1 equals bucket(1) % 5
    val b = df.sparkSession.range(1, 2)
      .select(HashSplit.bucket(col("id")).as("b"), HashSplit.fold(col("id"), 5).as("f"))
      .as[(Int, Int)].head()
    assert(b._2 === b._1 % 5)
  }

  test("rendezvous sharding: growing 10 to 11 shards moves ~1/11 of keys") {
    val rows = SparkEntry.queries("q_rendezvous_shards")(spark, TestSpark.Sf0001)
      .as[(Int, Long, Long)].collect()
    assert(rows.map(_._1).toSet === (0 until 10).toSet)
    val (n, moved) = (rows.map(_._2).sum, rows.map(_._3).sum)
    val frac = moved.toDouble / n
    // HRW invariant: exactly the keys whose argmax becomes shard 10 move
    assert(frac > 0.03 && frac < 0.17, s"moved fraction $frac")
  }
}
