package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting + local clustering coefficient over an undirected
  * edge list — the graph-cohesion diagnostics for the near-duplicate
  * graph: a doc whose neighborhood is fully interconnected (clustering
  * → 1) sits in a tight template cluster worth deduplicating as a unit,
  * while a high-degree hub with clustering → 0 is a shared-boilerplate
  * artifact stitching unrelated docs together ([[PageRank]] ranks the
  * hubs; this operator tells the two shapes apart).
  *
  * Algorithm: with edges canonical (src < dst, distinct), every triangle
  * a<b<c is found exactly once by the two-hop join
  * e(a,b) ⋈ e(b,c) ⋈ e(a,c). Per-node counts credit all three corners;
  * clustering = 2·tri / (deg·(deg−1)) for degree ≥ 2, null below.
  *
  * Scale shape: the two-hop join fans out by neighbor-list size, so the
  * input must be a bounded-degree graph — the shingle near-dup graph is
  * by construction (posting-list cap + min-shared floor). All joins are
  * equi-joins on node ids; per-node aggregates are |V|-bounded.
  *
  * Numeric discipline: degrees and triangle counts are exact integers;
  * clustering is one exact-integer division round-6 (d(d−1) for d > 2
  * always has a non-2/5 prime factor, so the quotient never terminates
  * exactly on a decimal half-boundary).
  */
object Triangles {

  /** @param edges (src, dst) with src < dst, one row per undirected edge.
    * @return (node, degree, triangles, clustering) for every node with
    *         at least one edge.
    */
  def nodeStats(edges: DataFrame): DataFrame = {
    // the triangle triple-join references the edge list three times and the
    // degree pass twice more — checkpoint it once so an expensive edge
    // builder (the shingle graph) runs once, not five times (guide §2.4)
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    val tri = e.as("ab")
      .join(e.as("bc"), col("ab.dst") === col("bc.src"))
      .join(e.as("ac"),
        col("ac.src") === col("ab.src") && col("ac.dst") === col("bc.dst"))
      .select(col("ab.src").as("a"), col("ab.dst").as("b"), col("bc.dst").as("c"))
    val triPerNode = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("triangles"))
    val deg = e.select(explode(array(col("src"), col("dst"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
    deg
      .join(triPerNode, Seq("node"), "left")
      .withColumn("triangles", coalesce(col("triangles"), lit(0L)))
      .withColumn("clustering",
        when(col("degree") >= 2,
          round(lit(2.0) * col("triangles") /
            (col("degree") * (col("degree") - 1)), 6)))
      .select(col("node"), col("degree"), col("triangles"), col("clustering"))
  }
}
