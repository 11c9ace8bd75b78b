package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{HllReplay, HyperBall}

class HyperBallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def estOf(members: Map[Long, Set[Long]]): Map[Long, Long] = {
    val rows = members.toSeq.flatMap { case (g, items) => items.map(i => (g, i)) }
    HllReplay.sketch(rows.toDF("g", "item"), itemCol = "item", groupCol = "g")
      .filter($"group_key" =!= "ALL")
      .collect().map(r => r.getString(0).toLong -> r.getLong(3)).toMap
  }

  test("star graph: ball counters equal the explicit-membership sketches per round") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (1L, 6L)).toDF("src", "dst")
    val nf = HyperBall.neighborhoodFunction(edges, rounds = 2).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(3)).toMap
    val all = (1L to 6L).toSet
    val t0 = estOf((1L to 6L).map(v => v -> Set(v)).toMap)
    val t1 = estOf(Map(1L -> all) ++ (2L to 6L).map(l => l -> Set(l, 1L)))
    val t2 = estOf((1L to 6L).map(v => v -> all).toMap)
    for (v <- 1L to 6L) {
      assert(nf((0, v)) == t0(v), s"t=0 node $v")
      assert(nf((1, v)) == t1(v), s"t=1 node $v")
      assert(nf((2, v)) == t2(v), s"t=2 node $v")
    }
  }

  test("path graph converges to one shared counter at the diameter") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val nf = HyperBall.neighborhoodFunction(edges, rounds = 3).collect()
    val atEnd = nf.filter(_.getInt(0) == 3).map(_.getLong(3)).distinct
    assert(atEnd.length == 1, s"all balls must equal the component: ${atEnd.toSeq}")
    // and t=1 middle nodes see 3 nodes, ends see 2 (exact via linear counting)
    val t1 = nf.filter(_.getInt(0) == 1).map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(t1(1L) == 2 && t1(4L) == 2 && t1(2L) == 3 && t1(3L) == 3)
  }

  test("estimates are monotone in t (register MAX can only grow)") {
    val docs = graft.sources.Tables(spark, TestSpark.Sf0001).documents
    val edges = graft.operators.Dedup.minhashPairs(docs).select($"id1".as("src"), $"id2".as("dst"))
    val nf = HyperBall.neighborhoodFunction(edges, rounds = 3).collect()
      .groupBy(_.getLong(1))
    nf.foreach { case (node, rows) =>
      val byT = rows.sortBy(_.getInt(0)).map(_.getLong(3))
      assert(byT.zip(byT.tail).forall { case (a, b) => a <= b }, s"node $node: ${byT.toSeq}")
    }
  }
}
