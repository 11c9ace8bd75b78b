package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Components

class ComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap

  test("a chain merges to one component labeled by its min id (multi-hop propagation)") {
    // 4-1 needs three propagation rounds: transitivity, not just adjacency
    assert(cc(Seq((1L, 2L), (2L, 3L), (3L, 4L))) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("disjoint cliques keep separate labels; direction and parallel edges don't matter") {
    val got = cc(Seq(
      (5L, 7L), (7L, 6L), (6L, 5L), (5L, 7L), // clique, mixed orientation, dup edge
      (20L, 10L) // reversed pair
    ))
    assert(got == Map(5L -> 5L, 6L -> 5L, 7L -> 5L, 10L -> 10L, 20L -> 10L))
  }

  test("empty edge list returns an empty frame") {
    assert(cc(Seq.empty) == Map.empty)
  }

  test("star graphs converge regardless of which endpoint holds the min") {
    // min at the hub and min at a leaf exercise both propagation directions
    assert(cc(Seq((1L, 10L), (1L, 11L), (1L, 12L))) ==
      Map(1L -> 1L, 10L -> 1L, 11L -> 1L, 12L -> 1L))
    assert(cc(Seq((50L, 2L), (50L, 31L), (50L, 42L))) ==
      Map(2L -> 2L, 31L -> 2L, 42L -> 2L, 50L -> 2L))
  }

  test("keepBest keeps the highest score per cluster, min id on ties, singletons themselves") {
    val rows = Seq(
      (1L, 50L), (2L, 80L), (3L, 80L), // cluster {1,2,3}: 2 and 3 tie at 80 -> 2 wins
      (4L, 10L), (5L, 99L),            // cluster {4,5}: 5 wins
      (9L, 7L)                         // singleton: survives as its own component
    ).toDF("doc_id", "n_chars")
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("src", "dst")
    val got = Components.keepBest(rows, edges)
      .select($"doc_id", $"component", $"n_chars").as[(Long, Long, Long)].collect().toSet
    assert(got == Set((2L, 1L, 80L), (5L, 4L, 99L), (9L, 9L, 7L)))
  }

  test("agrees with a driver-side union-find on a seeded random graph") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
    val got = cc(edges)

    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(n => n -> find(n)).toMap
    assert(got == expected)
  }
}
