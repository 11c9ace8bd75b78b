package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.JoinSizeEst
import graft.sources.Tables

/** Coordinated-sample join-size estimation: exact on sub-k domains, the
  * TakeOrdered plan shape, estimator accuracy on a large synthetic
  * domain, and determinism.
  */
final class JoinSizeEstSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sub-k domain: the estimate IS the exact join size") {
    // 100 keys, a-side multiplicity i % 3 + 1, b-side 2 — exact Σ a·b
    val a = (1 to 100).flatMap(i => Seq.fill(i % 3 + 1)(("k" + i, 1))).toDF("k", "x")
    val b = (1 to 100).flatMap(i => Seq.fill(2)(("k" + i, 1))).toDF("k", "x")
    val out = JoinSizeEst.estimate(a, "k", b, "k")
      .as[(Long, Long, Long, Long, Long)].head()
    val (kUsed, _, domainEst, est, exact) = out
    assert(kUsed === 100L && domainEst === 100L)
    assert(est === exact)
    assert(exact === a.join(b, Seq("k")).count())
  }

  test("keys on one side only contribute zero (full-outer domain)") {
    val a = Seq(("x", 1), ("x", 1), ("y", 1)).toDF("k", "v")
    val b = Seq(("y", 1), ("z", 1)).toDF("k", "v")
    val out = JoinSizeEst.estimate(a, "k", b, "k")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(out._1 === 3L) // domain = {x, y, z}
    assert(out._5 === 1L) // only y joins: 1·1
    assert(out._4 === 1L)
  }

  test("large domain: estimate within 40% of the exact self-join size") {
    // 5000 keys, skewed multiplicities (Zipf-ish): c = 1 + 2000/(i+10)
    val rows = (1 to 5000).flatMap { i =>
      Seq.fill(1 + 2000 / (i + 10))(("key" + i, 1))
    }.toDF("k", "v")
    val out = JoinSizeEst.estimate(rows, "k", rows, "k")
      .as[(Long, Long, Long, Long, Long)].head()
    val (kUsed, _, _, est, exact) = out
    assert(kUsed === 256L)
    assert(math.abs(est - exact).toDouble <= 0.40 * exact,
      s"est $est vs exact $exact")
  }

  test("plan: the bottom-k is a TakeOrdered, never a single-partition window") {
    val li = Tables(spark, TestSpark.Sf0001).lineitem
    val p = JoinSizeEst.estimate(li, "l_partkey", li, "l_partkey")
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert(!p.contains("Window"), s"no window allowed:\n${p.take(2000)}")
  }

  test("deterministic across runs") {
    val li = Tables(spark, TestSpark.Sf0001).lineitem
    def run() = JoinSizeEst.estimate(li, "l_partkey", li, "l_partkey")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(run() === run())
  }
}
