package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AbTest

/** A/B lift vs an independent java-MD5 replica of arms and the z formula. */
final class AbTestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def arm(userId: Long): Long = {
    val h = MessageDigest.getInstance("MD5")
      .digest(userId.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 12)
    java.lang.Long.parseLong(h, 16) % 2
  }

  test("counts, lift and z match the replica") {
    import spark.implicits._
    // users 1..40; user u converts iff u % 3 == 0
    val rows = (1L to 40L).flatMap { u =>
      Seq((u, "view", 0.0)) ++
        (if (u % 3 == 0) Seq((u, "purchase", 1.0)) else Nil)
    }
    val df = rows.toDF("user_id", "event_type", "value")
    val r = AbTest.conversionLift(df, convThreshold = 1L).collect().head
    val users = (1L to 40L).map(u => (arm(u), if (u % 3 == 0) 1L else 0L))
    val na = users.count(_._1 == 0).toLong
    val nb = users.count(_._1 == 1).toLong
    val ca = users.filter(_._1 == 0).map(_._2).sum
    val cb = users.filter(_._1 == 1).map(_._2).sum
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) === ((na, nb, ca, cb)))
    val pa = ca.toDouble / na; val pb = cb.toDouble / nb
    val pool = (ca + cb).toDouble / (na + nb)
    val z = (pb - pa) / math.sqrt(pool * (1.0 - pool) * (1.0 / na + 1.0 / nb))
    assert(r.getDouble(4) === math.floor((pb - pa) * 1e6 + 0.5) / 1e6)
    assert(r.getDouble(5) === math.floor(z * 1e6 + 0.5) / 1e6)
  }

  test("saturated conversion (pooled variance 0) reports z = 0, not an error") {
    import spark.implicits._
    val df = (1L to 10L).map(u => (u, "purchase", 1.0))
      .toDF("user_id", "event_type", "value")
    val r = AbTest.conversionLift(df, convThreshold = 1L).collect().head
    assert(r.getLong(2) + r.getLong(3) === r.getLong(0) + r.getLong(1))
    assert(r.getDouble(4) === 0.0)
    assert(r.getDouble(5) === 0.0)
  }
}
