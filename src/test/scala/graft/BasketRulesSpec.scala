package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BasketRules

class BasketRulesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 4 users: {1,2} {1,2} {1,3} {2} -> n_1=3, n_2=3, n_3=1, N=4
  private def inter = Seq(
    (10L, 1L), (10L, 2L),
    (11L, 1L), (11L, 2L),
    (12L, 1L), (12L, 3L),
    (13L, 2L)
  ).toDF("user_id", "item_id")

  test("hand-traced support, confidences, and lift") {
    val rows = BasketRules.rules(inter, "user_id", "item_id", minCount = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    val r = rows((1L, 2L)) // n_ab = 2
    assert(r.getLong(2) == 2L && r.getLong(3) == 3L && r.getLong(4) == 3L)
    assert(r.getLong(5) == 500000L)          // 2/4
    assert(r.getLong(6) == 666666L)          // 2/3 floored
    assert(r.getLong(7) == 666666L)
    // lift = 2·4/(3·3) = 8/9 < 1: co-occur slightly LESS than independent
    assert(r.getLong(8) == math.floor(2.0 * 4 / 3 / 3 * 1e6).toLong)
    assert(rows.size == 1, "pair (1,3) has n_ab = 1 < minCount")
  }

  test("lift separates an associated pair from an anti-associated one") {
    // {5,6} always together; 7 appears with everyone
    val d = Seq(
      (1L, 5L), (1L, 6L), (1L, 7L),
      (2L, 5L), (2L, 6L), (2L, 7L),
      (3L, 7L), (4L, 7L)
    ).toDF("user_id", "item_id")
    val m = BasketRules.rules(d, "user_id", "item_id", minCount = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(8)).toMap
    assert(m((5L, 6L)) == 2000000L, "always-together pair has lift N/n = 2")
    assert(m((5L, 7L)) == 1000000L, "ubiquitous item has lift exactly 1")
    assert(m((5L, 6L)) > m((5L, 7L)))
  }
}
