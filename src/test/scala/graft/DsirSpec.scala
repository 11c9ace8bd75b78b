package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dsir

/** Dsir.importanceScores vs an INDEPENDENT plain-collections replica of the
  * whole contract (java-MD5 buckets, add-1 multinomials, integer-micro λ
  * and norm quantization, BIGINT score sums, (score, id) top-k), plus the
  * semantic property the paper's selection exists for.
  */
final class DsirSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val B = 1024

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def bucket(g: String): Long =
    java.lang.Long.parseLong(md5hex(g).substring(0, 12), 16) % B

  /** Independent replica: (doc_id -> (n_grams, score_micro, selected)). */
  private def naive(
      docs: Seq[(Long, Boolean, String)],
      keepPct: Int): Map[Long, (Long, Long, Boolean)] = {
    def grams(text: String): Seq[String] = {
      val ts = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      ts ++ ts.zip(ts.drop(1)).map { case (a, b) => s"$a $b" }
    }
    val pos = docs.flatMap { case (id, isT, text) =>
      grams(text).map(g => (id, isT, bucket(g)))
    }
    val rc = pos.groupBy(_._3).map { case (bk, xs) => bk -> xs.size.toLong }
    val tc = pos.filter(_._2).groupBy(_._3).map { case (bk, xs) => bk -> xs.size.toLong }
    val lam = rc.map { case (bk, r) =>
      val t = tc.getOrElse(bk, 0L)
      bk -> math.floor((math.log(t + 1.0) - math.log(r + 1.0)) * 1e6 + 0.5).toLong
    }
    val rTot = pos.size.toLong
    val tTot = pos.count(_._2).toLong
    val gq = math.floor((math.log(tTot + B.toDouble) - math.log(rTot + B.toDouble))
      * 1e6 + 0.5).toLong
    val scored = pos.groupBy(_._1).map { case (id, xs) =>
      id -> ((xs.size.toLong, xs.map(x => lam(x._3)).sum - xs.size.toLong * gq))
    }
    val n = scored.size.toLong
    val keepN = math.max(1L, n * keepPct / 100L)
    val order = scored.toSeq.sortBy { case (id, (_, s)) => (-s, id) }
    val sel = order.take(keepN.toInt).map(_._1).toSet
    scored.map { case (id, (ng, s)) => id -> ((ng, s, sel(id))) }
  }

  // two "domains" with distinct vocabularies plus shared filler
  private val docs: Seq[(Long, Boolean, String)] =
    (1L to 10L).map(i => (i, true,
      s"alpha beta gamma shared$i filler alpha beta")) ++
      (11L to 30L).map(i => (i, i <= 12L,
        if (i <= 12L) "alpha beta gamma delta filler"
        else s"omega psi chi shared$i filler omega psi"))

  test("scores and selection match the independent replica exactly") {
    import spark.implicits._
    val df = docs.toDF("doc_id", "is_t", "text")
    val got = Dsir
      .importanceScores(df, col("is_t"), b = B, keepPct = 25)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(got === naive(docs, 25))
  }

  test("target-vocabulary documents outscore off-domain ones") {
    import spark.implicits._
    val df = docs.toDF("doc_id", "is_t", "text")
    val got = Dsir.importanceScores(df, col("is_t"), b = B, keepPct = 25)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val onDomain = (1L to 12L).map(got)
    val offDomain = (13L to 30L).map(got)
    assert(onDomain.min > offDomain.max)
  }

  test("deterministic across runs") {
    import spark.implicits._
    val df = docs.toDF("doc_id", "is_t", "text")
    def run() = Dsir.importanceScores(df, col("is_t"), b = B, keepPct = 25)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3))).sortBy(_._1).toSeq
    assert(run() === run())
  }
}
