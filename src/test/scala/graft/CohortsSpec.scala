package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Cohorts

class CohortsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val P = 100L // period seconds, for readable fixtures

  private def run(rows: Seq[(Long, Long)]): Map[(Long, Long), (Long, Long, Double)] =
    Cohorts.retention(rows.toDF("user_id", "ts_s"), periodSeconds = P)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap

  test("hand-computed matrix: two cohorts, partial retention") {
    // cohort 0: users 1,2,3 (first activity in [0,100)); cohort 1: user 4.
    // period 1 actives from cohort 0: users 1,2. period 2: user 1 only.
    val rows = Seq(
      (1L, 10L), (1L, 110L), (1L, 210L),
      (2L, 20L), (2L, 120L),
      (3L, 30L),
      (4L, 150L), (4L, 250L))
    val res = run(rows)
    assert(res(0L -> 0L) == ((3L, 3L, 1.0)))
    assert(res(0L -> 1L) == ((2L, 3L, 0.666667)))
    assert(res(0L -> 2L) == ((1L, 3L, 0.333333)))
    assert(res(1L -> 0L) == ((1L, 1L, 1.0)))
    assert(res(1L -> 1L) == ((1L, 1L, 1.0)))
    assert(res.size == 5)
  }

  test("repeat events within one period count the user once") {
    val res = run(Seq((1L, 5L), (1L, 50L), (1L, 99L), (2L, 10L)))
    assert(res(0L -> 0L) == ((2L, 2L, 1.0)))
    assert(res.size == 1)
  }

  test("every cohort has offset 0 with retention exactly 1.0") {
    val rows = Seq((1L, 0L), (2L, 105L), (3L, 250L), (2L, 350L), (3L, 260L))
    val res = run(rows)
    for (((_, off), (n, size, r)) <- res if off == 0L) {
      assert(n == size); assert(r == 1.0)
    }
    assert(Set(0L, 1L, 2L).subsetOf(res.keySet.map(_._1)))
  }

  test("gap periods produce no cell; later return still counted at its offset") {
    val res = run(Seq((1L, 10L), (1L, 310L))) // active periods 0 and 3
    assert(res.keySet == Set(0L -> 0L, 0L -> 3L))
    assert(res(0L -> 3L) == ((1L, 1L, 1.0)))
  }

  test("plan stays at three exchanges (user fold, cell agg, matrix window)") {
    val df = (1L to 50L).flatMap(u => Seq((u, u * 7L), (u, u * 7L + 500L)))
      .toDF("user_id", "ts_s")
    val plan = Cohorts.retention(df, periodSeconds = P)
      .queryExecution.executedPlan.toString
    val n = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(n <= 3, s"expected <= 3 hash exchanges, got $n:\n$plan")
  }
}
