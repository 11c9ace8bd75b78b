package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{HashSplit, Msprt}
import graft.sources.Tables

class MsprtSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("A/A validity: md5 arms on real data never reach significance") {
    val out = Msprt.sequentialLift(Tables(spark, TestSpark.Sf0001).events)
      .orderBy($"day").collect()
    assert(out.nonEmpty)
    assert(out.forall(!_.getBoolean(7)), "an A/A split must not fire")
    // always-valid: ln p is non-increasing in the look index
    val lnp = out.map(_.getLong(6))
    assert(lnp.zip(lnp.tail).forall { case (a, b) => b <= a })
  }

  test("planted effect: significance is reached and never un-reached") {
    // 400 users x 25 days; arm-1 users purchase daily, arm-0 never
    val users = (1L to 400L).toDF("user_id")
      .withColumn("arm", HashSplit.md548($"user_id") % 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val rows = for {
      (u, arm) <- users.toSeq
      day <- 0L until 25L
      evt <- Seq("view") ++ (if (arm == 1L) Seq("purchase") else Nil)
    } yield (u, day * 86400000000000L + u * 1000L, evt)
    val events = rows.toDF("user_id", "ts_ns", "event_type")
    val out = Msprt.sequentialLift(events).orderBy($"day").collect()
    val sig = out.map(_.getBoolean(7))
    assert(sig.last, "a total separation must fire")
    val first = sig.indexOf(true)
    assert(first >= 0 && sig.drop(first).forall(identity),
      "once significant, always significant")
    // the z-score day-one look alone would NOT be enough evidence for the
    // mixture prior at n=16; the martingale accumulates across looks
    assert(out.map(_.getLong(5)).max > 0L)
  }
}
