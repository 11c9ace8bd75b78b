package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sinkhorn

class SinkhornSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("kernel table: monotone literal micros, K(0) = 1e6, strictly positive") {
    val k = Sinkhorn.KernelE6
    assert(k.length == 64 && k.head == 1000000L)
    k.sliding(2).foreach { case Seq(a, b) => assert(a > b) }
    assert(k.last > 0L, s"farthest kernel ${k.last} must stay positive")
    assert(k(8) == 367879L) // e^-1 micros — pins the generation spelling
  }

  test("debiasing: proportional distributions read exactly zero") {
    // group 'a' and the rest ('b'+'c') have IDENTICAL shapes: every value
    // appears once in a and twice in the complement → b̂ = â bitwise
    // (2x/2N ≡ x/N in IEEE) → all three costs equal, div2 = 0 exactly
    val vals = (0 until 640).map(i => (i % 64).toDouble)
    val df = (vals.map(("a", _)) ++ vals.map(("b", _)) ++ vals.map(("c", _)))
      .toDF("src", "v")
    val got = Sinkhorn.vsRest(spark, df, "src", "v")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("a")._6 == 0L, s"proportional div2 ${got("a")}")
    assert(got("a")._3 == got("a")._4 && got("a")._4 == got("a")._5, got("a"))
  }

  test("a shift separates; bigger shifts read bigger; div2 ≥ 0") {
    def mk(shift: Double) = {
      val base = (0 until 600).map(i => (i % 30).toDouble)
      (base.map(("ref1", _)) ++ base.map(("ref2", _)) ++
        base.map(v => ("shifted", v + shift))).toDF("src", "v")
    }
    def div2Of(shift: Double): Long = {
      val m = Sinkhorn.vsRest(spark, mk(shift), "src", "v")
        .as[(String, Long, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> r._6).toMap
      assert(m.values.forall(_ >= 0L), s"negative div2: $m")
      m("shifted")
    }
    val small = div2Of(10.0)
    val large = div2Of(30.0)
    assert(small > 0L, "a real shift must read positive")
    assert(large > small, s"shift 30 ($large) must exceed shift 10 ($small)")
  }

  test("deterministic across partitionings") {
    val rnd = new scala.util.Random(47)
    val rows = (1 to 4000).map { i =>
      (s"s${i % 4}", rnd.nextDouble() * 50 + (if (i % 4 == 0) 12.0 else 0.0))
    }
    def run(parts: Int) = Sinkhorn.vsRest(spark,
        rows.toDF("src", "v").repartition(parts), "src", "v")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(run(1) == run(17))
  }
}
