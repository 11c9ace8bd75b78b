package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PersonalizedPageRank

/** Hand-traced integer mass states, seed-proximity ordering, seedless
  * collapse, and partitioning determinism.
  */
final class PersonalizedPageRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(
      edges: Seq[(Long, Long)],
      seeds: Seq[Long],
      iterations: Int
  ): Map[Long, Long] = {
    import spark.implicits._
    PersonalizedPageRank.seededRanks(
      edges.toDF("src", "dst"), seeds.toDF("node"), iterations = iterations)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("two-node path, seed one end: exact states after 2 rounds") {
    // r0 = (1e12, 0); round 1 → (1.5e11, 8.5e11);
    // round 2 → (1.5e11 + floor(0.85·8.5e11 + .5), floor(0.85·1.5e11 + .5))
    val got = run(Seq(1L -> 2L), Seq(1L), iterations = 2)
    assert(got === Map(1L -> 872500000000L, 2L -> 127500000000L))
  }

  test("mass concentrates near the seed (barbell)") {
    val edges = Seq(1L -> 2L, 2L -> 3L, 1L -> 3L,
      10L -> 11L, 11L -> 12L, 10L -> 12L, 3L -> 10L)
    val got = run(edges, Seq(1L), iterations = 4)
    assert(got(1L) > got(2L))
    assert(Seq(2L, 3L).map(got).min > Seq(11L, 12L).map(got).max,
      s"seed triangle must outrank the far one: $got")
  }

  test("no seeds in the graph: all mass is zero (no division is evaluated)") {
    val got = run(Seq(1L -> 2L), Seq(99L), iterations = 3)
    assert(got === Map(1L -> 0L, 2L -> 0L))
  }

  test("deterministic across input partitionings") {
    import spark.implicits._
    val edges = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L, 2L -> 4L)
    val a = run(edges, Seq(2L), iterations = 3)
    val b = PersonalizedPageRank.seededRanks(
      edges.toDF("src", "dst").repartition(7),
      Seq(2L).toDF("node").repartition(3), iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }
}
