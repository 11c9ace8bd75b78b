package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.KMeansReplay

/** KMeansReplay vs an INDEPENDENT naive replica of the determinism
  * contract (java MessageDigest seeding + plain-collections Lloyd with the
  * same integer rules) on a two-blob synthetic — full assignment equality,
  * not just aggregate shape.
  */
final class KMeansReplaySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def md5hex(s: String): String =
    MessageDigest
      .getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map("%02x".format(_))
      .mkString

  /** Naive replica: quantize, md5-rank seeds, `rounds` Lloyd updates with
    * floor(S/n + 0.5) centers, final assignment with (dist, cid) ties.
    */
  private def naive(
      pts: Seq[(Long, Array[Float])],
      d: Int,
      k: Int,
      rounds: Int): Map[Long, (Long, Long)] = {
    val q = pts.map { case (id, v) =>
      id -> v.take(d).map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong)
    }
    var centers: Seq[(Long, Array[Long])] = q
      .sortBy { case (id, _) => (md5hex(id.toString), id) }
      .take(k)
      .zipWithIndex
      .map { case ((_, xq), i) => (i.toLong, xq) }
    def dist(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def assignAll: Map[Long, (Long, Long)] = q.map { case (id, xq) =>
      val (cid, dd) =
        centers.map { case (cid, c) => (cid, dist(xq, c)) }.minBy { case (cid, dd) => (dd, cid) }
      id -> (cid, dd)
    }.toMap
    for (_ <- 0 until rounds) {
      val byC = assignAll.toSeq.groupBy { case (_, (cid, _)) => cid }
      centers = byC.toSeq.sortBy(_._1).map { case (cid, members) =>
        val xs = members.map { case (id, _) => q.find(_._1 == id).get._2 }
        val n = xs.size.toLong
        val c = Array.tabulate(d) { i =>
          math.floor(xs.map(_(i)).sum.toDouble / n.toDouble + 0.5).toLong
        }
        (cid, c)
      }
    }
    assignAll
  }

  private val d = 4
  private val blobs: Seq[(Long, Array[Float])] =
    (1L to 20L).map(i => i -> Array(0.1f + 0.001f * i, 0.2f, -0.1f, 0.05f)) ++
      (21L to 40L).map(i => i -> Array(-0.4f + 0.001f * i, -0.3f, 0.3f, -0.2f))

  test("assignments match the independent naive replica exactly") {
    import spark.implicits._
    val df = blobs.toDF("vec_id", "embedding")
    val got = KMeansReplay
      .assignments(spark, df, "embedding", d, k = 2, rounds = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got === naive(blobs, d, k = 2, rounds = 2))
  }

  test("two well-separated blobs land in two clusters; stats add up") {
    import spark.implicits._
    val df = blobs.toDF("vec_id", "embedding")
    val stats = KMeansReplay
      .clusterStats(spark, df, "embedding", d, k = 2, rounds = 2)
      .collect()
    assert(stats.map(_.getLong(1)).sum === 40L)
    assert(stats.length === 2)
    // After 2 rounds the centers sit in the blobs: inertia is far below the
    // single-cluster sum of squares (~blob separation² · n).
    assert(stats.map(_.getLong(2)).sum < 40L * 250000000000L)
  }

  test("deterministic across runs") {
    import spark.implicits._
    val df = blobs.toDF("vec_id", "embedding")
    def run() = KMeansReplay
      .clusterStats(spark, df, "embedding", d, k = 2, rounds = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
      .toSeq
    assert(run() === run())
  }
}
