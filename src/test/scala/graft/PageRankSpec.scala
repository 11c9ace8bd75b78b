package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PageRank

class PageRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], iters: Int = 5): Map[Long, Double] =
    PageRank.ranks(edges.toDF("src", "dst"), "src", "dst", iterations = iters)
      .as[(Long, Double)].collect().toMap

  test("symmetric cycle: all nodes equal 1/N") {
    val got = run(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)))
    assert(got.size == 4)
    got.values.foreach(r => assert(math.abs(r - 0.25) < 1e-8, got))
  }

  test("star: the hub outranks every leaf; mass is conserved") {
    val got = run(Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)))
    val hub = got(1L)
    (2L to 5L).foreach(l => assert(hub > got(l) * 2, got))
    assert(math.abs(got.values.sum - 1.0) < 1e-6, s"mass: ${got.values.sum}")
  }

  test("matches a closed-form driver-side power iteration with the same rounding") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 4L), (5L, 1L))
    val adj = scala.collection.mutable.Map.empty[Long, Vector[Long]]
    edges.foreach { case (a, b) =>
      adj(a) = adj.getOrElse(a, Vector.empty) :+ b
      adj(b) = adj.getOrElse(b, Vector.empty) :+ a
    }
    val n = adj.size
    def round9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    var r = adj.keys.map(_ -> round9(1.0 / n)).toMap
    (1 to 5).foreach { _ =>
      val prev = r
      r = adj.keys.map { v =>
        val s = adj(v).map(u => prev(u) / adj(u).size).sum
        v -> round9(0.15 / n + 0.85 * s)
      }.toMap
    }
    val got = run(edges)
    assert(got.keySet == r.keySet)
    got.foreach { case (v, x) => assert(math.abs(x - r(v)) < 1e-8, s"node $v: $x vs ${r(v)}") }
  }

  test("deterministic across partitionings") {
    val edges = (1 to 60).map(i => (i.toLong, (i % 20 + 1).toLong)).filter(e => e._1 != e._2)
    val a = PageRank.ranks(edges.toDF("src", "dst").repartition(1), "src", "dst")
      .as[(Long, Double)].collect().toSet
    val b = PageRank.ranks(edges.toDF("src", "dst").repartition(13), "src", "dst")
      .as[(Long, Double)].collect().toSet
    assert(a == b && a.nonEmpty)
  }
}
