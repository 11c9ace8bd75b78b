package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Diversity

/** HHI decile buckets vs hand-computed indices. */
final class DiversitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("hand-computed buckets") {
    import spark.implicits._
    // u1: [a,a,b] → HHI = (4+1)/9 ≈ 0.5556 → bucket 5
    // u2: [a] → HHI = 1 → bucket 10
    // u3: [a,b,c,d] → HHI = 4/16 = 0.25 → bucket 2
    val df = Seq(
      (1L, "a"), (1L, "a"), (1L, "b"),
      (2L, "a"),
      (3L, "a"), (3L, "b"), (3L, "c"), (3L, "d"))
      .toDF("user_id", "event_type")
    val got = Diversity.hhiBuckets(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(5L -> ((1L, 3L)), 10L -> ((1L, 1L)), 2L -> ((1L, 4L))))
  }

  test("uniform two-type user sits exactly on the 0.5 boundary → bucket 5") {
    import spark.implicits._
    val df = Seq((1L, "a"), (1L, "b")).toDF("user_id", "event_type")
    val got = Diversity.hhiBuckets(df).collect()
    assert(got.head.getLong(0) === 5L)
  }
}
