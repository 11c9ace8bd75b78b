package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Cuped

/** CUPED adjusted lift vs an independent sufficient-statistics replica. */
final class CupedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def arm(userId: Long): Long = {
    val h = MessageDigest.getInstance("MD5")
      .digest(userId.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 12)
    java.lang.Long.parseLong(h, 16) % 2
  }

  test("theta and lifts match the replica") {
    import spark.implicits._
    // 12 users; user u spends (u mod 5 + 1) dollars at t=100 (pre) and
    // (2u mod 7 + 1) dollars at t=900 (post); range mid = 500.
    val rows = (1L to 12L).flatMap { u =>
      Seq(
        (u, "purchase", (u % 5 + 1).toDouble, 100L),
        (u, "purchase", (2 * u % 7 + 1).toDouble, 900L))
    } ++ Seq((99L, "view", 0.0, 0L), (99L, "view", 0.0, 1000L))
    val df = rows.toDF("user_id", "event_type", "value", "s")
      .select(col("user_id"), col("event_type"), col("value"),
        timestamp_seconds(col("s")).as("ts"))
    val r = Cuped.adjustedLift(df).collect().head

    val xs = (1L to 12L).map(u => (u, (u % 5 + 1) * 100, (2 * u % 7 + 1) * 100))
    val n = xs.size.toDouble
    val sx = xs.map(_._2).sum.toDouble
    val sy = xs.map(_._3).sum.toDouble
    val sxy = xs.map(t => t._2.toLong * t._3).sum.toDouble
    val sxx = xs.map(t => t._2.toLong * t._2).sum.toDouble
    val theta = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    val xbar = sx / n
    def g(a: Long) = xs.filter(t => arm(t._1) == a)
    def adj(a: Long) = {
      val gg = g(a)
      val na = gg.size.toDouble
      (gg.map(_._3).sum - theta * (gg.map(_._2).sum - na * xbar)) / na
    }
    def mean(a: Long) = { val gg = g(a); gg.map(_._3).sum.toDouble / gg.size }
    def f6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert((r.getLong(0), r.getLong(1)) === ((g(0).size.toLong, g(1).size.toLong)))
    assert(r.getDouble(2) === f6(theta))
    assert(r.getDouble(3) === f6((mean(1) - mean(0)) / 100.0))
    assert(r.getDouble(4) === f6((adj(1) - adj(0)) / 100.0))
  }
}
