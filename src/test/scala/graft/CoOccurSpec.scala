package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CoOccur

class CoOccurSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("counts users per canonical pair, honors minCount, dedupes interactions") {
    val inter = Seq(
      (1L, 10L), (1L, 20L), (1L, 20L), // duplicate interaction collapses
      (2L, 10L), (2L, 20L), (2L, 30L),
      (3L, 10L), (3L, 30L)
    ).toDF("user_id", "item_id")
    val got = CoOccur.pairs(inter, "user_id", "item_id", capPerUser = 10, minCount = 2L)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got == Map((10L, 20L) -> 2L, (10L, 30L) -> 2L))
    got.keys.foreach { case (a, b) => assert(a < b) }
  }

  test("hot user emits at most C(cap, 2) pairs; cap membership is md5-deterministic") {
    val hot = (1 to 100).map(i => (1L, i.toLong)).toDF("user_id", "item_id")
    val pairs = CoOccur.pairs(hot, "user_id", "item_id", capPerUser = 5, minCount = 1L)
      .as[(Long, Long, Long)].collect()
    assert(pairs.length == 10, s"C(5,2) = 10, got ${pairs.length}") // 5 choose 2
    // determinism across partitionings
    val again = CoOccur.pairs(hot.repartition(7), "user_id", "item_id",
      capPerUser = 5, minCount = 1L).as[(Long, Long, Long)].collect()
    assert(pairs.toSet == again.toSet)
  }

  test("pair counts never exceed the number of users holding both items") {
    val rnd = new scala.util.Random(5)
    val inter = (1 to 400).map(_ => (rnd.nextInt(20).toLong, rnd.nextInt(30).toLong))
      .toDF("user_id", "item_id")
    val byUser = inter.as[(Long, Long)].collect().toSet
      .groupBy((p: (Long, Long)) => p._1)
      .view.mapValues(_.map(_._2)).toMap
    CoOccur.pairs(inter, "user_id", "item_id", capPerUser = 100, minCount = 1L)
      .as[(Long, Long, Long)].collect().foreach { case (a, b, n) =>
        val exact = byUser.values.count(items => items.contains(a) && items.contains(b))
        assert(n == exact, s"pair ($a,$b)")
      }
  }
}
