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

  test("scalable variant matches closed-form bucketed-index arithmetic") {
    def md548(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 12), 16)
    }
    val positives = inter.as[(Long, Long)].collect().toSet
    // index permutation: ordered by (md5_48 % B, md5_48, item)
    val universe = positives.map(_._2).toSeq
      .map(i => (md548(i.toString) % 16, md548(i.toString), i)).sorted.map(_._3)
    val n = universe.length
    val expected = positives.map(_._1).flatMap { u =>
      val cands = (1 to 10).map(s => (s, universe((md548(s"${u}_$s") % n).toInt)))
      val ded = cands.groupBy(_._2).map { case (i, ss) => (ss.map(_._1).min, i) }.toSeq
      ded.filter { case (_, i) => !positives.contains((u, i)) }
        .sortBy { case (s, i) => (s, i) }.take(5)
        .zipWithIndex.map { case ((_, i), r) => (u, i, r + 1L) }
    }
    val got = NegativeSampler
      .sampleScalable(inter, "user_id", "item_id", k = 5, indexBuckets = 16)
      .select($"user_id", $"item_id", $"neg_rank").as[(Long, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("scalable variant: no positives, k respected, partition-invariant") {
    val a = NegativeSampler
      .sampleScalable(inter.repartition(7), "user_id", "item_id", k = 4, indexBuckets = 8)
      .select($"user_id", $"item_id", $"neg_rank").as[(Long, Long, Long)].collect()
    val b = NegativeSampler
      .sampleScalable(inter.repartition(2), "user_id", "item_id", k = 4, indexBuckets = 8)
      .select($"user_id", $"item_id", $"neg_rank").as[(Long, Long, Long)].collect()
    assert(a.toSet == b.toSet && a.nonEmpty)
    val pos = inter.as[(Long, Long)].collect().toSet
    a.foreach { case (u, i, r) =>
      assert(!pos.contains((u, i)) && r >= 1 && r <= 4)
    }
  }

  test("scalable item-index join carries no broadcast hint on the catalog") {
    // the universe side of the slot→item join must not be hinted for
    // broadcast — only the bounded offsets table and the 1-row count are;
    // sample() by contrast deliberately hints the indexed universe (_idx)
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    def hintedOutputs(df: org.apache.spark.sql.DataFrame): Seq[Set[String]] =
      df.queryExecution.analyzed.collect {
        case h: ResolvedHint => h.child.output.map(_.name).toSet
      }
    val scalable = hintedOutputs(NegativeSampler
      .sampleScalable(inter, "user_id", "item_id", k = 3, indexBuckets = 8))
    assert(scalable.nonEmpty && scalable.forall(cols => !cols.contains("_idx")),
      s"catalog index is broadcast-hinted: $scalable")
    val dense = hintedOutputs(NegativeSampler.sample(inter, "user_id", "item_id", k = 3))
    assert(dense.exists(_.contains("_idx")))
  }
}
