package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RankTest

/** Mann–Whitney U vs an independent textbook replica (with ties). */
final class RankTestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // Thursday 1970-01-01 is day 0 → (0+3)%7 = 3 (weekday);
  // day 2 = Saturday → (2+3)%7 = 5 (weekend).
  private val weekday = 0L * 86400
  private val weekend = 2L * 86400

  private def events(rows: Seq[(Double, Boolean)]) = {
    import spark.implicits._
    rows.toDF("value", "we").select(
      lit("purchase").as("event_type"), col("value"),
      timestamp_seconds(when(col("we"), weekend).otherwise(weekday)).as("ts"))
  }

  /** Independent replica: average ranks, U_A, tie-corrected z. */
  private def naive(a: Seq[Double], b: Seq[Double]): (Long, Double) = {
    val all = (a.map((_, true)) ++ b.map((_, false))).sortBy(_._1)
    val ranks = all.zipWithIndex.groupBy { case ((v, _), _) => v }.toSeq.flatMap {
      case (_, g) =>
        val avg = g.map(_._2 + 1).sum.toDouble / g.size
        g.map { case ((_, isA), _) => (isA, avg) }
    }
    val na = a.size.toDouble; val nb = b.size.toDouble; val nn = na + nb
    val ra = ranks.filter(_._1).map(_._2).sum
    val u = ra - na * (na + 1) / 2
    val tcorr = all.groupBy(_._1).values.map(_.size.toLong)
      .map(t => t * t * t - t).sum
    val sig2 = na * nb / 12.0 * ((nn + 1.0) - tcorr / (nn * (nn - 1.0)))
    val z = (u - na * nb / 2.0) / math.sqrt(sig2)
    ((2 * u).toLong, math.floor(z * 1e6 + 0.5) / 1e6)
  }

  test("no ties: matches the replica") {
    val a = Seq(5.0, 7.0, 9.0)        // weekend
    val b = Seq(1.0, 2.0, 3.0, 4.0)   // weekday
    val r = RankTest.weekendRankSum(events(
      a.map((_, true)) ++ b.map((_, false)))).collect().head
    val (u2, z) = naive(a, b)
    assert((r.getLong(0), r.getLong(1)) === ((3L, 4L)))
    assert(r.getLong(2) === u2)
    assert(r.getDouble(3) === z)
  }

  test("heavy ties: doubled average ranks stay exact") {
    val a = Seq(2.0, 2.0, 3.0)
    val b = Seq(1.0, 2.0, 2.0, 3.0)
    val r = RankTest.weekendRankSum(events(
      a.map((_, true)) ++ b.map((_, false)))).collect().head
    val (u2, z) = naive(a, b)
    assert(r.getLong(2) === u2)
    assert(r.getDouble(3) === z)
  }
}
