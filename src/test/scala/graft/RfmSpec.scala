package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Rfm

/** RFM quartile segmentation vs hand-assigned quartiles. */
final class RfmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("aligned metrics put each user block in the diagonal segments") {
    import spark.implicits._
    // 8 users; user u purchases u times, each of value u, last at hour u:
    // all three metrics order identically → r=f=m quartile for everyone,
    // quartiles of 8 rows = 2 users each → segments 111,111,222,222,...
    val rows = for {
      u <- 1L to 8L
      k <- 1L to u
    } yield (u, "purchase", u.toDouble, u * 3600 + k)
    val df = rows.toDF("user_id", "event_type", "value", "s")
      .select(col("user_id"), col("event_type"), col("value"),
        timestamp_seconds(col("s")).as("ts"))
    val got = Rfm.segments(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet === Set(111L, 222L, 333L, 444L))
    assert(got(111L)._1 === 2L)
    // segment 111 = users 1,2: spend 1*1 + 2*2 = 5
    assert(got(111L)._2 === 5.0)
    // segment 444 = users 7,8: spend 49 + 64 = 113
    assert(got(444L)._2 === 113.0)
  }

  test("non-purchase events are ignored") {
    import spark.implicits._
    val df = Seq(
      (1L, "purchase", 5.0, 1000L), (1L, "view", 100.0, 2000L),
      (2L, "purchase", 7.0, 3000L))
      .toDF("user_id", "event_type", "value", "s")
      .select(col("user_id"), col("event_type"), col("value"),
        timestamp_seconds(col("s")).as("ts"))
    val got = Rfm.segments(df).collect().map(_.getLong(1)).sum
    assert(got === 2L)
  }
}
