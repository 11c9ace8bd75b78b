package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PassAtK

/** pass@k estimator: hand-traced single-task values (including the
  * n−c < k => exactly 1 convention), the n >= k eligibility filter, and
  * the micro-quantized mean.
  */
final class PassAtKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def events(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("user_id", "event_type")
  }

  test("n=2, c=1: pass@1 = 0.5; n=2 c=0: 0; n-c < k: exactly 1") {
    val ev = events(
      (1L, "purchase"), (1L, "view"),    // n=2 c=1 -> pass@1 = 1 - 1/2
      (2L, "view"), (2L, "click"),       // n=2 c=0 -> 0
      (3L, "purchase"))                  // n=1 c=1 -> n-c=0 < 1 -> 1.0
    val got = PassAtK.passAtK(ev, Seq(1)).collect().head
    assert(got.getAs[Long]("n_tasks") === 3L)
    assert(got.getAs[Double]("avg_pass") === 0.5)
  }

  test("pass@2 telescoped product by hand: n=4 c=1 -> 1 - (3/4)(2/3) = 0.5") {
    val ev = events((1L, "purchase"), (1L, "view"), (1L, "view"), (1L, "view"))
    val got = PassAtK.passAtK(ev, Seq(2)).collect().head
    assert(got.getAs[Double]("avg_pass") === 0.5)
  }

  test("tasks with n < k are excluded from that k") {
    val ev = events(
      (1L, "purchase"), (1L, "view"), (1L, "view"),  // n=3, eligible for k<=3
      (2L, "purchase"))                              // n=1, only k=1
    val got = PassAtK.passAtK(ev, Seq(1, 3)).collect()
      .map(r => r.getAs[Int]("k") -> r.getAs[Long]("n_tasks")).toMap
    assert(got(1) === 2L)
    assert(got(3) === 1L)
  }

  test("estimator equals 1 - C(n-c,k)/C(n,k) exactly on a combinatorial case") {
    // n=5, c=2, k=2: C(3,2)/C(5,2) = 3/10 -> 0.7
    val ev = events(Seq.fill(2)((1L, "purchase")) ++ Seq.fill(3)((1L, "view")): _*)
    val got = PassAtK.passAtK(ev, Seq(2)).collect().head
    assert(got.getAs[Double]("avg_pass") === 0.7)
  }
}
