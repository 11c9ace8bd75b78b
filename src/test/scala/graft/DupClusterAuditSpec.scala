package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Components
import graft.queries.QueryHelpers.shingleEdgesWeighted

class DupClusterAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def audit(docs: org.apache.spark.sql.DataFrame) = {
    val ew = shingleEdgesWeighted(docs)
    val comps = Components.connectedComponents(ew.select(col("src"), col("dst")))
    val sizes = comps.groupBy(col("component")).agg(count(lit(1)).as("n_nodes"))
    val edges = ew.join(comps, ew("src") === comps("node"))
      .groupBy(col("component"))
      .agg(count(lit(1)).as("n_edges"), min(col("n_shared")).as("min_shared"))
    sizes.join(edges, Seq("component"))
      .select(col("component"), col("n_nodes"), col("n_edges"), col("min_shared"),
        expr("n_edges * 2000000 DIV (n_nodes * (n_nodes - 1))").as("completeness_e6"))
  }

  test("chain merge reads as low completeness; clique reads as full") {
    val p = "p1 p2 p3 p4 p5 p6 p7"   // 5 interior 3-shingles
    val q = "q1 q2 q3 q4 q5 q6 q7"
    val docs = Seq(
      // chain: 1–2 share p, 2–3 share q, 1–3 share NOTHING → one
      // 3-node component with only 2 direct edges
      (1L, s"$p a1 a2 a3"),
      (2L, s"$p $q"),
      (3L, s"$q c1 c2 c3"),
      // triangle: 10/11/12 all share the same long phrase → 3 edges
      (10L, "z1 z2 z3 z4 z5 z6 z7 d1"),
      (11L, "z1 z2 z3 z4 z5 z6 z7 d2"),
      (12L, "z1 z2 z3 z4 z5 z6 z7 d3"),
      // isolated
      (99L, "lone words that match nobody at all here")).toDF("doc_id", "text")
    val got = audit(docs)
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got.keySet == Set(1L, 10L), s"components: ${got.keySet}")
    // the chain: 3 nodes, 2 edges, completeness 2·2e6/6 = 666666
    assert(got(1L) == ((1L, 3L, 2L, 5L, 666666L)), got(1L))
    // the clique: 3 nodes, 3 edges, full completeness; 5 shared interior
    // shingles per pair (the d-suffix breaks the crossing shingles)
    assert(got(10L) == ((10L, 3L, 3L, 5L, 1000000L)), got(10L))
  }

  test("deterministic across partitionings") {
    // 15 docs (under the 20-doc hot-shingle cap) all sharing one phrase
    // → a single 15-clique; suffixes keep crossing shingles distinct
    val docs = (1 to 15).map { i =>
      (i.toLong, s"c1 c2 c3 c4 c5 c6 c7 u$i v$i w$i x$i")
    }
    def run(parts: Int) =
      audit(docs.toDF("doc_id", "text").repartition(parts))
        .as[(Long, Long, Long, Long, Long)].collect().toSet
    val a = run(1)
    assert(a == run(9))
    assert(a == Set((1L, 15L, 105L, 5L, 1000000L)), a)
  }
}
