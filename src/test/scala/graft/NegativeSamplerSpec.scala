package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.NegativeSampler

class NegativeSamplerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val inter = {
    val rnd = new scala.util.Random(3)
    (1 to 600).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(50).toLong))
      .distinct.toDF("user_id", "item_id")
  }

  test("negatives never intersect positives and respect k") {
    val neg = NegativeSampler.sample(inter, "user_id", "item_id", k = 5)
      .select($"user_id", $"item_id", $"neg_rank").as[(Long, Long, Long)].collect()
    val pos = inter.as[(Long, Long)].collect().toSet
    assert(neg.nonEmpty)
    neg.foreach { case (u, i, r) =>
      assert(!pos.contains((u, i)), s"sampled a positive: ($u, $i)")
      assert(r >= 1 && r <= 5)
    }
    neg.groupBy(_._1).foreach { case (u, rows) =>
      assert(rows.length <= 5 && rows.map(_._3).sorted.sameElements(1L to rows.length))
    }
  }

  test("membership matches closed-form hash-slot arithmetic") {
    val positives = inter.as[(Long, Long)].collect().toSet
    val universe = positives.map(_._2).toSeq.sorted
    val n = universe.length
    def md548(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 12), 16)
    }
    val users = positives.map(_._1)
    val expected = users.flatMap { u =>
      val cands = (1 to 10).map(s => (s, universe((md548(s"${u}_$s") % n).toInt)))
      val ded = cands.groupBy(_._2).map { case (i, ss) => (ss.map(_._1).min, i) }.toSeq
      ded.filter { case (_, i) => !positives.contains((u, i)) }
        .sortBy { case (s, i) => (s, i) }.take(5)
        .zipWithIndex.map { case ((_, i), r) => (u, i, r + 1L) }
    }
    val got = NegativeSampler.sample(inter, "user_id", "item_id", k = 5)
      .select($"user_id", $"item_id", $"neg_rank").as[(Long, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("deterministic across partitionings") {
    val a = NegativeSampler.sample(inter.repartition(1), "user_id", "item_id", k = 3)
      .select($"user_id", $"item_id").as[(Long, Long)].collect().toSet
    val b = NegativeSampler.sample(inter.repartition(7), "user_id", "item_id", k = 3)
      .select($"user_id", $"item_id").as[(Long, Long)].collect().toSet
    assert(a == b && a.nonEmpty)
  }
}
