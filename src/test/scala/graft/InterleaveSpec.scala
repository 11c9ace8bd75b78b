package graft

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Interleave

/** Full-order equivalence with an independent java-MD5 + plain-collections
  * WFQ replica, plus the per-source monotonicity invariant.
  */
final class InterleaveSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Independent replica of the whole ordering. */
  private def replica(docs: Seq[(Long, String)], alpha: Double)
  : Seq[(Long, String, Long, Long, Long, Long)] = {
    val n = docs.size.toDouble
    val wm = docs.groupBy(_._2).map { case (s, ds) =>
      s -> math.floor(math.pow(ds.size / n, alpha) * 1000000.0 + 0.5).toLong
    }
    val ranked = docs.groupBy(_._2).toSeq.flatMap { case (s, ds) =>
      ds.map(_._1).sortBy(id => (md5hex(id.toString), id))
        .zipWithIndex.map { case (id, i) =>
          val r = (i + 1).toLong
          (id, s, r, wm(s), r * 1000000000L / wm(s))
        }
    }
    ranked.sortBy { case (id, s, _, _, v) => (v, s, id) }
      .zipWithIndex
      .map { case ((id, s, r, w, v), i) => (id, s, r, w, v, (i + 1).toLong) }
  }

  private def run(docs: Seq[(Long, String)], alpha: Double = 0.5) = {
    import spark.implicits._
    Interleave.trainingOrder(docs.toDF("doc_id", "source"), alpha = alpha)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSeq
  }

  test("constructed 16:4 corpus matches the replica exactly (alpha = 1)") {
    val docs = (1L to 16L).map(_ -> "big") ++ (17L to 20L).map(_ -> "small")
    assert(run(docs, alpha = 1.0).sortBy(_._6) === replica(docs, 1.0))
  }

  test("fixture corpus matches the replica exactly (alpha = 0.5)") {
    val docs = sources.Tables(spark, "/root/testdata/sf0.001").documents
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    val got = run(docs)
    assert(got.sortBy(_._6) === replica(docs, 0.5))
    // WFQ invariant: within a source, global position strictly follows
    // the source rank
    got.groupBy(_._2).values.foreach { rows =>
      val byRank = rows.sortBy(_._3)
      assert(byRank.map(_._6) === byRank.map(_._6).sorted)
    }
  }
}
