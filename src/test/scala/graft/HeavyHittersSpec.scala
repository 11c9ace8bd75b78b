package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.expressions.FreqSketch
import graft.operators.HeavyHitters

class HeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Zipf-ish corpus: item i appears ~ N/i times. */
  private def zipf(n: Int, seed: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { _ =>
      val r = rnd.nextDouble()
      val i = math.min(20, math.max(1, math.ceil(1.0 / (r * 2.0 + 1e-9)).toInt))
      s"item$i"
    }
  }

  private def trueHH(items: Seq[String], k: Int): Map[String, Long] = {
    val n = items.size
    items.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * (k + 1) > n }.toMap
  }

  test("two-pass output == true heavy hitters, for every partitioning") {
    val items = zipf(5000, seed = 7)
    val expected = trueHH(items, k = 4)
    assert(expected.nonEmpty)
    for (p <- Seq(1, 3, 8)) {
      val df = items.toDF("item").repartition(p)
      val got = HeavyHitters.heavyHitters(df, Seq.empty, "item", k = 4)
        .select($"item", $"n_item").as[(String, Long)].collect().toMap
      assert(got == expected, s"partitions=$p")
    }
  }

  test("sketch keys are a superset of true heavy hitters (MG guarantee)") {
    val items = zipf(3000, seed = 13)
    for (k <- Seq(2, 5, 9); p <- Seq(1, 4, 16)) {
      val keys = items.toDF("item").repartition(p)
        .agg(FreqSketch.freq_sketch($"item", k).as("m"))
        .select(map_keys($"m")).as[Seq[String]].collect().head.toSet
      assert(keys.size <= k)
      val hh = trueHH(items, k).keySet
      assert(hh.subsetOf(keys), s"k=$k p=$p missing=${hh.diff(keys)}")
    }
  }

  test("k >= distinct items: sketch IS the exact histogram") {
    val items = Seq("a", "a", "a", "b", "b", "c")
    val m = items.toDF("item").repartition(3)
      .agg(FreqSketch.freq_sketch($"item", 10).as("m"))
      .select($"m").as[Map[String, Long]].collect().head
    assert(m == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("serialization round-trips keys past the 64 KiB writeUTF limit") {
    // items whose UTF-8 encoding exceeds 65535 bytes would have thrown
    // UTFDataFormatException under the old writeUTF spelling at shuffle time
    val big = "x" * 70000
    val sk = graft.expressions.FreqSketch(
      org.apache.spark.sql.catalyst.expressions.Literal("dummy"), 3)
    val buf = sk.createAggregationBuffer()
    buf.put(big, 41L)
    buf.put("small", 7L)
    val back = sk.deserialize(sk.serialize(buf))
    assert(back.get(big) == 41L && back.get("small") == 7L && back.size == 2)
  }

  test("nulls are skipped and do not count toward group size") {
    val df = Seq(Some("a"), Some("a"), None, Some("b")).toDF("item")
    val got = HeavyHitters.heavyHitters(df, Seq.empty, "item", k = 1)
      .select($"item", $"n_item", $"n_group").as[(String, Long, Long)].collect()
    // n = 3 non-null; threshold n/2: only a (2*2 > 3)
    assert(got.toSeq == Seq(("a", 2L, 3L)))
  }

  test("groups sketch independently") {
    val df = (Seq.fill(9)(("g1", "x")) ++ Seq.fill(1)(("g1", "y")) ++
      Seq.fill(5)(("g2", "y")) ++ Seq.fill(5)(("g2", "z")) ++ Seq.fill(2)(("g2", "x")))
      .toDF("g", "item")
    val got = HeavyHitters.heavyHitters(df, Seq("g"), "item", k = 2)
      .select($"g", $"item", $"n_item").as[(String, String, Long)].collect().toSet
    // thresholds: g1 n=10 → >3.33: x(9); g2 n=12 → >4: y(5), z(5)
    assert(got == Set(("g1", "x", 9L), ("g2", "y", 5L), ("g2", "z", 5L)))
  }

  test("plan: candidates broadcast, corpus filtered by semi join before the exact count") {
    val df = zipf(500, seed = 3).toDF("item")
    val plan = HeavyHitters.heavyHitters(df, Seq.empty, "item", k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan)
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastHashJoin"), plan)
  }
}
