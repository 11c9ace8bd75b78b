package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TargetEncode

class TargetEncodeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, String, Long)], m: Double = 10.0)
      : Map[Long, (Option[Double], Double)] =
    TargetEncode.leaveOneOut(
        rows.toDF("id", "cat", "y"), Seq("cat"), "y", smoothing = m)
      .select($"id", $"loo_rate", $"loo_smoothed")
      .as[(Long, Option[Double], Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  test("a row's own label is excluded (the leakage check)") {
    // cat "a": labels 1, 0 → LOO of the y=1 row sees only the 0; vice versa.
    val res = run(Seq((1L, "a", 1L), (2L, "a", 0L)))
    assert(res(1L)._1.contains(0.0))
    assert(res(2L)._1.contains(1.0))
  }

  test("hand-computed rates and smoothing") {
    // cat "a": y = 1,1,0 (n=3, s=2); global prior = 3/5.
    val rows = Seq((1L, "a", 1L), (2L, "a", 1L), (3L, "a", 0L),
      (4L, "b", 1L), (5L, "b", 0L))
    val res = run(rows, m = 2.0)
    assert(res(1L)._1.contains(0.5)) // (2-1)/2
    assert(res(3L)._1.contains(1.0)) // (2-0)/2
    val prior = 3.0 / 5
    assert(math.abs(res(1L)._2 - (2 - 1 + 2 * prior) / (3 - 1 + 2)) < 1e-6)
    assert(math.abs(res(3L)._2 - (2 - 0 + 2 * prior) / (3 - 1 + 2)) < 1e-6)
  }

  test("singleton category: loo_rate null, smoothed falls back toward prior") {
    val res = run(Seq((1L, "solo", 1L), (2L, "b", 0L), (3L, "b", 1L)), m = 10.0)
    assert(res(1L)._1.isEmpty)
    val prior = 2.0 / 3
    assert(math.abs(res(1L)._2 - (1 - 1 + 10 * prior) / (0 + 10)) < 1e-6)
  }

  test("category stats join does not hint-broadcast (AQE decides)") {
    val df = (1L to 100L).map(i => (i, s"c${i % 7}", i % 2)).toDF("id", "cat", "y")
    val analyzed = TargetEncode.leaveOneOut(df, Seq("cat"), "y")
      .queryExecution.analyzed.toString
    assert(!analyzed.contains("ResolvedHint"))
  }
}
