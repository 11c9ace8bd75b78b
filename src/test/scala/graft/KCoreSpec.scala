package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.KCore

class KCoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def core(edges: Seq[(Long, Long)], k: Int, rounds: Int = 8): Map[Long, Long] =
    KCore.peel(edges.toDF("src", "dst"), k, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("triangle with a pendant: 2-core keeps the triangle only") {
    val res = core(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)), k = 2)
    assert(res == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("path graph unravels to an empty 2-core over multiple rounds") {
    val res = core(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)), k = 2)
    assert(res.isEmpty)
  }

  test("bridge between two triangles survives the 2-core") {
    val res = core(
      Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)),
      k = 2)
    assert(res == Map(1L -> 2L, 2L -> 2L, 3L -> 3L, 4L -> 3L, 5L -> 2L, 6L -> 2L))
  }

  test("K4 minus an edge cascades to an empty 3-core") {
    val k4MinusOne = Seq((1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(core(k4MinusOne, k = 3).isEmpty)
    val k4 = (1L, 2L) +: k4MinusOne
    assert(core(k4, k = 3) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("fixed round budget: one round peels only the current leaves") {
    // 1-2-3-4-5 path, rounds=1: endpoints 1 and 5 drop, the rest remain
    val res = core(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)), k = 2, rounds = 1)
    assert(res == Map(2L -> 1L, 3L -> 2L, 4L -> 1L))
  }
}
