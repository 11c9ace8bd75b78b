package graft

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.KCenter

/** Full-trajectory equivalence with an independent java-MD5 +
  * plain-collections greedy replica, on a constructed set and the fixture
  * embeddings; selected points self-assign at distance zero.
  */
final class KCenterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def replica(vecs: Seq[(Long, Array[Float])], d: Int, k: Int)
  : Map[Long, (Long, Long, Int)] = {
    val q = vecs.filter(_._2.length >= d).map { case (id, v) =>
      id -> v.take(d).map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong)
    }.toMap
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val first = q.keys.toSeq.minBy(id => (md5hex(id.toString), id))
    var sel = Seq(first)
    while (sel.size < k) {
      val rem = q.keys.toSeq.filterNot(sel.contains)
      val far = rem
        .map(id => (id, sel.map(s => d2(q(id), q(s))).min))
        .minBy { case (id, dm) => (-dm, id) }._1
      sel = sel :+ far
    }
    val rank = sel.zipWithIndex.map { case (id, i) => id -> (i + 1) }.toMap
    q.keys.map { id =>
      val (c, dd) = sel.map(s => (s, d2(q(id), q(s))))
        .minBy { case (c, dd) => (dd, c) } match { case (c, dd) => (c, dd) }
      id -> ((c, dd, rank.getOrElse(id, 0)))
    }.toMap
  }

  private def run(vecs: Seq[(Long, Array[Float])], d: Int, k: Int)
  : Map[Long, (Long, Long, Int)] = {
    import spark.implicits._
    KCenter.greedyCoreset(spark, vecs.toDF("vec_id", "embedding"), "embedding", d, k)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3))))
      .toMap
  }

  test("constructed 2-d set matches the replica (k = 3)") {
    val vecs = Seq(
      1L -> Array(0.0f, 0.0f), 2L -> Array(10.0f, 0.0f),
      3L -> Array(0.0f, 10.0f), 4L -> Array(0.1f, 0.0f),
      5L -> Array(9.9f, 0.2f))
    assert(run(vecs, d = 2, k = 3) === replica(vecs, d = 2, k = 3))
  }

  test("fixture embeddings match the replica (k = 8, d = 64)") {
    val vecs = sources.Tables(spark, "/root/testdata/sf0.001").embeddings
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .toSeq
    val got = run(vecs, d = 64, k = 8)
    assert(got === replica(vecs, d = 64, k = 8))
    // selected points self-assign at distance 0
    got.values.filter(_._3 > 0).foreach { case (c, dd, _) => assert(dd === 0L) }
    assert(got.values.count(_._3 > 0) === 8)
  }
}
