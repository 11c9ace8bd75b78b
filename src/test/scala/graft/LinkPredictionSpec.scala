package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LinkPrediction

class LinkPredictionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // u1:{1,2} deg2  u2:{1,2,3} deg3  u3:{1,3} deg2  u4:{2,3} deg2
  private def inter = Seq(
    (1L, 1L), (1L, 2L),
    (2L, 1L), (2L, 2L), (2L, 3L),
    (3L, 1L), (3L, 3L),
    (4L, 2L), (4L, 3L)
  ).toDF("user_id", "item_id")

  test("hand-traced common-neighbor / Adamic-Adar / resource-allocation scores") {
    val rows = LinkPrediction.itemScores(inter, "user_id", "item_id",
        capPerUser = 20, minCommon = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    // pair (1,2): shared by u1 (deg 2) and u2 (deg 3)
    val r12 = rows((1L, 2L))
    assert(r12.getLong(2) == 2L)
    val aa2 = math.floor(1e6 / math.log(2.0)).toLong // 1442695
    val aa3 = math.floor(1e6 / math.log(3.0)).toLong // 910239
    assert(r12.getLong(3) == aa2 + aa3)
    assert(r12.getLong(4) == 500000L + 333333L)
    // pair (1,3): u2 (deg 3) and u3 (deg 2) — same cn, same weights
    val r13 = rows((1L, 3L))
    assert(r13.getLong(2) == 2L && r13.getLong(3) == aa2 + aa3)
    // pair (2,3): u2 (deg 3) and u4 (deg 2)
    assert(rows((2L, 3L)).getLong(3) == aa2 + aa3)
    assert(rows.size == 3, "every item pair here shares exactly 2 users")
  }

  test("minCommon filters single-shared-user pairs") {
    val one = Seq((1L, 10L), (1L, 11L)).toDF("user_id", "item_id")
    assert(LinkPrediction.itemScores(one, "user_id", "item_id").count() == 0L)
    assert(LinkPrediction.itemScores(one, "user_id", "item_id",
      minCommon = 1L).count() == 1L)
  }

  test("basket cap bounds a hot user's pair fan-out") {
    val hot = (1L to 30L).map(i => (9L, i)).toDF("user_id", "item_id")
    val pairs = LinkPrediction.itemScores(hot, "user_id", "item_id",
      capPerUser = 5, minCommon = 1L)
    assert(pairs.count() == 10L, "5 capped items -> C(5,2) pairs")
    // capped degree (5) is what the weights see, not the raw 30
    val aa5 = math.floor(1e6 / math.log(5.0)).toLong
    assert(pairs.collect().forall(r => r.getLong(3) == aa5))
  }
}
