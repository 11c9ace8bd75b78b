package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IntervalOverlap

class IntervalOverlapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def naiveOverlaps(iv: Seq[(Long, Long, Long)]): Map[Long, Long] =
    iv.map { case (id, s, e) =>
      id -> iv.count { case (jid, js, je) => jid != id && js <= e && s <= je }.toLong
    }.toMap

  test("hand case: chain, disjoint, touching endpoints, containment") {
    // [0,10] [5,15] overlap; [5,15] [15,20] touch (closed ⇒ overlap);
    // [30,40] isolated; [0,100] contains all but [130,140]
    val iv = Seq(
      (1L, 0L, 10L), (2L, 5L, 15L), (3L, 15L, 20L),
      (4L, 30L, 40L), (5L, 0L, 100L), (6L, 130L, 140L))
    val got = IntervalOverlap
      .overlapCounts(iv.toDF("id", "s", "e"), Seq("id"), "s", "e", width = 7L)
      .as[(Long, Long)].collect().toMap
    assert(got == naiveOverlaps(iv))
    assert(got(6L) == 0L)
    assert(got(2L) == 3L) // 1, 3 (touching), 5
  }

  test("randomized equivalence vs the naive quadratic count") {
    val rnd = new scala.util.Random(42)
    val iv = (1L to 200L).map { id =>
      val s = rnd.nextInt(500).toLong
      (id, s, s + rnd.nextInt(60).toLong)
    }
    val got = IntervalOverlap
      .overlapCounts(iv.toDF("id", "s", "e"), Seq("id"), "s", "e", width = 50L)
      .as[(Long, Long)].collect().toMap
    assert(got == naiveOverlaps(iv))
  }

  test("width does not change the answer (bucket-residual split is internal)") {
    val iv = Seq((1L, 0L, 10L), (2L, 3L, 4L), (3L, 9L, 30L), (4L, 31L, 35L))
    val df = iv.toDF("id", "s", "e")
    val expected = naiveOverlaps(iv)
    for (w <- Seq(1L, 2L, 1000L)) {
      val got = IntervalOverlap.overlapCounts(df, Seq("id"), "s", "e", width = w)
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"width=$w")
    }
  }

  test("countLE: strict vs inclusive at equal values") {
    val probes = Seq((1L, 10L)).toDF("id", "v")
    val points = Seq(5L, 10L, 10L, 11L).toDF("p")
    val le = IntervalOverlap
      .countLE(probes, Seq("id"), "v", points, "p", strict = false, 4L, "c")
      .as[(Long, Long)].collect().head._2
    val lt = IntervalOverlap
      .countLE(probes, Seq("id"), "v", points, "p", strict = true, 4L, "c")
      .as[(Long, Long)].collect().head._2
    assert(le == 3L && lt == 1L)
  }

  test("concurrency timeline: starts, ends, open-after with gap hours") {
    // width 10: interval A [0,5] lives in bucket 0; B [3,25] spans 0..2;
    // C [38,39] bucket 3. Buckets emitted: 0 (2 starts, 1 end), 2 (1 end),
    // 3 (1 start, 1 end). Bucket 1 has no boundary ⇒ absent.
    val iv = Seq((1L, 0L, 5L), (2L, 3L, 25L), (3L, 38L, 39L)).toDF("id", "s", "e")
    val got = IntervalOverlap.concurrencyTimeline(iv, "s", "e", width = 10L)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(0L) == ((0L, 2L, 1L, 1L)))
    assert(got(2L) == ((2L, 0L, 1L, 0L)))
    assert(got(3L) == ((3L, 1L, 1L, 0L)))
    assert(!got.contains(1L))
  }

  test("plan: no nested-loop or cartesian join anywhere in overlapCounts") {
    val df = Seq((1L, 0L, 10L), (2L, 5L, 15L)).toDF("id", "s", "e")
    val plan = IntervalOverlap.overlapCounts(df, Seq("id"), "s", "e")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
