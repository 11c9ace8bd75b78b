package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Triangles

class TrianglesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Option[Double])] =
    Triangles.nodeStats(edges.toDF("src", "dst"))
      .as[(Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap

  test("a triangle: every node has degree 2, one triangle, clustering 1") {
    val res = run(Seq((1L, 2L), (2L, 3L), (1L, 3L)))
    for (n <- 1L to 3L) assert(res(n) == ((2L, 1L, Some(1.0))), s"node $n")
  }

  test("a path has no triangles; endpoints have clustering null") {
    val res = run(Seq((1L, 2L), (2L, 3L)))
    assert(res(1L) == ((1L, 0L, None)))
    assert(res(2L) == ((2L, 0L, Some(0.0))))
    assert(res(3L) == ((1L, 0L, None)))
  }

  test("K4: each node in 3 triangles, clustering 1; total triangles = 4") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val res = run(k4)
    for (n <- 1L to 4L) assert(res(n) == ((3L, 3L, Some(1.0))), s"node $n")
    assert(res.values.map(_._2).sum == 12) // 4 triangles x 3 corners
  }

  test("hub with unconnected leaves: clustering 0 at the hub") {
    // star 1-{2,3,4} plus a far triangle 5-6-7
    val res = run(Seq((1L, 2L), (1L, 3L), (1L, 4L), (5L, 6L), (6L, 7L), (5L, 7L)))
    assert(res(1L) == ((3L, 0L, Some(0.0))))
    assert(res(5L)._3.contains(1.0))
  }

  test("hand case: one shared edge between a triangle and a pendant") {
    // triangle 1-2-3 plus pendant edge 3-4
    val res = run(Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)))
    assert(res(3L) == ((3L, 1L, Some(0.333333))))
    assert(res(4L) == ((1L, 0L, None)))
  }
}
