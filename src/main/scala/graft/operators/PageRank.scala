package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over an undirected edge list — importance
  * scoring for near-dup graphs (which document in a duplicate cluster is
  * the canonical hub?), link graphs, co-occurrence graphs. Power
  * iteration, unrolled a fixed number of rounds so the result is a pure
  * function of the edges:
  *
  *   r₀(v) = 1/N;  rᵢ₊₁(v) = teleport/N + damping · Σ_{u∼v} rᵢ(u)/deg(u)
  *
  * Each iteration is one equi-join plus one aggregate on the node key —
  * the same bounded-iteration shape as [[Components]]; no collect, no
  * per-node driver work. Ranks are ROUND-9 after every iteration on both
  * engines, so the float state entering each round is identical and the
  * final ranks are engine-bitwise-equal (q_pagerank hash-matches an
  * unrolled DuckDB spelling).
  *
  * Undirected: every node has degree ≥ 1, so there are no dangling-mass
  * corrections to model. Iteration hygiene matches [[LabelPropagation]]:
  * the edge list, degree table and 1-row node count are persisted for the
  * loop and released at the end; each round's ranks are persisted +
  * materialized + released so lineage stays flat (the unpersisted 5-deep
  * chain re-planned poorly under AQE — BENCH_r11's 21 s regression). The
  * RETURNED frame is the final round's persisted ranks — `.unpersist()`
  * when done (or rely on the session's cache clear).
  */
object PageRank {

  def ranks(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 5,
      damping: Double = 0.85,
      teleport: Double = 0.15
  ): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val bi = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .union(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .persist()
    val deg = bi.groupBy(col("a")).agg(count(lit(1)).as("d")).persist()
    // 1-row count, computed ONCE and persisted — each round broadcasts it
    // without re-running the distinct
    val n = bi.select(col("a")).distinct().agg(count(lit(1)).as("_n")).persist()
    var r = bi.select(col("a").as("node")).distinct()
      .crossJoin(broadcast(n))
      .select(col("node"), round(lit(1.0) / col("_n"), 9).as("r"))
      .persist()
    r.count()
    for (_ <- 1 to iterations) {
      val next = bi
        .join(r.withColumnRenamed("node", "a"), Seq("a"))
        .join(deg, Seq("a"))
        .select(col("b").as("node"), (col("r") / col("d")).as("_c"))
        .groupBy(col("node")).agg(sum(col("_c")).as("_s"))
        .crossJoin(broadcast(n))
        .select(col("node"),
          round(lit(teleport) / col("_n") + lit(damping) * col("_s"), 9).as("r"))
        .persist()
      next.count()
      r.unpersist()
      r = next
    }
    bi.unpersist()
    deg.unpersist()
    n.unpersist()
    r.select(col("node"), col("r").as("rank"))
  }
}
