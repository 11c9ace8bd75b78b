package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** External clustering evaluation — Adjusted Rand Index (Hubert & Arabie
  * 1985) and purity of a clustering against ground-truth labels, the
  * standard "did the unsupervised structure recover the classes" check a
  * curation pipeline runs before trusting cluster-based dedup/selection.
  *
  * Engine-exactness: everything reduces to the contingency table
  * n_ij = |cluster i ∩ label j| — exact BIGINTs from one aggregate. The
  * pair counts C(x,2) = x(x−1) DIV 2 are exact integers (x(x−1) is even;
  * operands non-negative so DIV ≡ //), and ARI's one rational expression
  *
  *   ARI = (Σij C(nij,2) − ΣiC(ai,2)·ΣjC(bj,2)/C(n,2))
  *       / (½(ΣiC(ai,2)+ΣjC(bj,2)) − ΣiC(ai,2)·ΣjC(bj,2)/C(n,2))
  *
  * is evaluated over integers < 2⁵³ in one fixed spelling — identical
  * IEEE on both engines, floor-6 at the end. Purity = Σi maxj nij / n
  * with a deterministic max (integers), same treatment.
  *
  * Scale shape: one shuffle to build the contingency table (bounded by
  * k·|labels| rows), then broadcast-size aggregates; the clustering
  * itself is whatever produced `assignments`.
  */
object ClusterEval {

  /** One row: (n, pair_index, a_pairs, b_pairs, purity_hits, ari, purity)
    * for cluster assignments (idCol, clusterCol) joined to labels
    * (idCol, labelCol).
    */
  def ariPurity(
      assignments: DataFrame,
      labels: DataFrame,
      idCol: String = "vec_id",
      clusterCol: String = "cid",
      labelCol: String = "label"
  ): DataFrame = {
    val cont = assignments.select(col(idCol), col(clusterCol).as("_c"))
      .join(labels.select(col(idCol), col(labelCol).as("_l")), Seq(idCol))
      .groupBy(col("_c"), col("_l")).agg(count(lit(1)).as("_nij"))
      .persist()
    val idx = cont.agg(
      sum(expr("_nij * (_nij - 1) DIV 2")).as("pair_index"),
      sum(col("_nij")).as("n"))
    val aP = cont.groupBy(col("_c")).agg(sum(col("_nij")).as("_a"))
      .agg(sum(expr("_a * (_a - 1) DIV 2")).as("a_pairs"))
    val bP = cont.groupBy(col("_l")).agg(sum(col("_nij")).as("_b"))
      .agg(sum(expr("_b * (_b - 1) DIV 2")).as("b_pairs"))
    val pur = cont.groupBy(col("_c")).agg(max(col("_nij")).as("_m"))
      .agg(sum(col("_m")).as("purity_hits"))
    val one = idx.crossJoin(broadcast(aP)).crossJoin(broadcast(bP))
      .crossJoin(broadcast(pur))
    val nP = expr("n * (n - 1) DIV 2")
    val e = col("a_pairs").cast("double") * col("b_pairs").cast("double") /
      nP.cast("double")
    val denom =
      (col("a_pairs") + col("b_pairs")).cast("double") / lit(2.0d) - e
    val ari = (col("pair_index").cast("double") - e) / denom
    def floor6(c: org.apache.spark.sql.Column) =
      floor(c * lit(1000000.0d) + lit(0.5d)) / lit(1000000.0d)
    one.select(
      col("n"), col("pair_index"), col("a_pairs"), col("b_pairs"),
      col("purity_hits"),
      // identical-partition degenerate case (denominator 0) is ARI 1 by
      // convention; the comparison is on an engine-identical double
      when(denom === 0.0d, lit(1.0d)).otherwise(floor6(ari)).as("ari"),
      floor6(col("purity_hits").cast("double") / col("n").cast("double"))
        .as("purity"))
  }
}
