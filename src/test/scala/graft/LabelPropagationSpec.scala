package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LabelPropagation

/** Hand-traced synchronous-LPA rounds: clique convergence, the documented
  * period-2 oscillation on a path, bridge splitting, and tie determinism.
  */
final class LabelPropagationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(edges: Seq[(Long, Long)], rounds: Int = 3): Map[Long, Long] = {
    import spark.implicits._
    val out = LabelPropagation
      .communities(edges.toDF("src", "dst"), rounds = rounds)
    val got = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.unpersist()
    got
  }

  test("a triangle converges to the minimum id in 3 rounds") {
    // 5-6-7 clique: r1 (5:6, 6:5, 7:5), r2 (5:5, 6:5, 7:5), r3 stable
    assert(run(Seq(5L -> 6L, 6L -> 7L, 5L -> 7L)) ===
      Map(5L -> 5L, 6L -> 5L, 7L -> 5L))
  }

  test("path graph oscillates deterministically (the synchronous caveat)") {
    // P4 1-2-3-4 hand trace: r1 (1:2, 2:1, 3:2, 4:3), r2 (1:1, 2:2, 3:1,
    // 4:2), r3 (1:2, 2:1, 3:2, 4:1) — period-2, but a pure function of
    // the rounds budget
    assert(run(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L)) ===
      Map(1L -> 2L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("two cliques joined by one bridge edge keep separate communities") {
    // cliques {1,2,3} and {10,11,12}, bridge 3-10: each side's majority
    // drowns the single cross label. Hand trace: the left settles on 1;
    // the right settles on 3 — the bridge endpoint's id leaks INTO the
    // right clique as a label in round 1 (10 adopts min-neighbor 3) and
    // wins its majority, while node 3 itself stays with the left
    val edges = Seq(1L -> 2L, 2L -> 3L, 1L -> 3L,
      10L -> 11L, 11L -> 12L, 10L -> 12L, 3L -> 10L)
    val got = run(edges)
    assert(got(1L) === 1L && got(2L) === 1L && got(3L) === 1L)
    assert(got(10L) === 3L && got(11L) === 3L && got(12L) === 3L)
  }

  test("ties break to the smallest label (single edge, one round)") {
    // after r1 each endpoint adopts the other's label; with rounds = 1
    // node 8 sees only {9} and vice versa
    assert(run(Seq(8L -> 9L), rounds = 1) === Map(8L -> 9L, 9L -> 8L))
  }
}
