package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** External clustering evaluation — Adjusted Rand Index (Hubert & Arabie
  * 1985), purity, and Normalized Mutual Information of a clustering
  * against ground-truth labels, the standard "did the unsupervised
  * structure recover the classes" checks a curation pipeline runs before
  * trusting cluster-based dedup/selection.
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
  /** Exact contingency table n_ij over (cluster, label). */
  private def contingency(
      assignments: DataFrame,
      labels: DataFrame,
      idCol: String,
      clusterCol: String,
      labelCol: String
  ): DataFrame =
    assignments.select(col(idCol), col(clusterCol).as("_c"))
      .join(labels.select(col(idCol), col(labelCol).as("_l")), Seq(idCol))
      .groupBy(col("_c"), col("_l")).agg(count(lit(1)).as("_nij"))

  def ariPurity(
      assignments: DataFrame,
      labels: DataFrame,
      idCol: String = "vec_id",
      clusterCol: String = "cid",
      labelCol: String = "label"
  ): DataFrame = {
    val cont = contingency(assignments, labels, idCol, clusterCol, labelCol)
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
    // Materialize the 1-row joined aggregate eagerly so the contingency
    // cache can be released HERE instead of leaking past the call (the
    // four aggregates are its only consumers). The returned frame derives
    // from this persisted 1-row frame — the session's cache clear (or the
    // caller) owns that negligible entry.
    val one = idx.crossJoin(broadcast(aP)).crossJoin(broadcast(bP))
      .crossJoin(broadcast(pur))
      .persist()
    one.count()
    cont.unpersist()
    val nP = expr("n * (n - 1) DIV 2")
    val e = col("a_pairs").cast("double") * col("b_pairs").cast("double") /
      nP.cast("double")
    val denom =
      (col("a_pairs") + col("b_pairs")).cast("double") / lit(2.0d) - e
    val ari = (col("pair_index").cast("double") - e) / denom
    one.select(
      col("n"), col("pair_index"), col("a_pairs"), col("b_pairs"),
      col("purity_hits"),
      // identical-partition degenerate case (denominator 0) is ARI 1 by
      // convention; the comparison is on an engine-identical double
      when(denom === 0.0d, lit(1.0d)).otherwise(floor6(ari)).as("ari"),
      floor6(col("purity_hits").cast("double") / col("n").cast("double"))
        .as("purity"))
  }

  /** Normalized Mutual Information (arithmetic normalization,
    * NMI = 2·I(U,V) / (H(U)+H(V))) over the SAME contingency table the ARI
    * uses — the information-theoretic complement to the pair-counting view.
    *
    * Engine-exactness (the ln-replay discipline): unlike the Markov
    * entropy's per-state handful of terms, the MI sum runs over the whole
    * k×|labels| table, where a float sum's addend ORDER would leak engine
    * scheduling into the 6th decimal. So every ln term is quantized to an
    * INTEGER MICRO — floor(term·10⁶ + 0.5), one fixed float spelling per
    * term (the q_rrf_fusion BM25 discipline: 10⁶ is the proven granularity
    * for ln-derived terms; finer scales sit within cross-engine libm ulp
    * noise) — and the sums are exact BIGINT adds (order-free). The final
    * normalization is one replayed float division, floor-6. Degenerate
    * case H(U)+H(V)=0 (both partitions are single blocks) is NMI 1 by
    * convention.
    *
    * Output (one row): (n, mi_e6, hu_e6, hv_e6, nmi).
    */
  def nmi(
      assignments: DataFrame,
      labels: DataFrame,
      idCol: String = "vec_id",
      clusterCol: String = "cid",
      labelCol: String = "label"
  ): DataFrame = {
    val cont = contingency(assignments, labels, idCol, clusterCol, labelCol)
      .persist()
    val nTot = cont.agg(sum(col("_nij")).as("n"))
    val aS = cont.groupBy(col("_c")).agg(sum(col("_nij")).as("_a"))
    val bS = cont.groupBy(col("_l")).agg(sum(col("_nij")).as("_b"))
    def e6(term: org.apache.spark.sql.Column) =
      floor(term * lit(1000000.0d) + lit(0.5d)).cast("long")
    // MI terms: (nij/n)·ln(nij·n / (ai·bj)), each quantized BEFORE the sum
    val miTerm = (col("_nij").cast("double") / col("n").cast("double")) *
      log((col("_nij").cast("double") * col("n").cast("double")) /
        (col("_a").cast("double") * col("_b").cast("double")))
    val mi = cont
      .join(broadcast(aS), Seq("_c"))
      .join(broadcast(bS), Seq("_l"))
      .crossJoin(broadcast(nTot))
      .agg(sum(e6(miTerm)).as("mi_e6"), max(col("n")).as("n"))
    // Marginal entropies, same quantization
    def hTerm(m: org.apache.spark.sql.Column) =
      -(m.cast("double") / col("n").cast("double")) *
        log(m.cast("double") / col("n").cast("double"))
    val hu = aS.crossJoin(broadcast(nTot)).agg(sum(e6(hTerm(col("_a")))).as("hu_e6"))
    val hv = bS.crossJoin(broadcast(nTot)).agg(sum(e6(hTerm(col("_b")))).as("hv_e6"))
    val one = mi.crossJoin(broadcast(hu)).crossJoin(broadcast(hv)).persist()
    one.count()
    cont.unpersist()
    val denom = (col("hu_e6") + col("hv_e6")).cast("double")
    one.select(
      col("n"), col("mi_e6"), col("hu_e6"), col("hv_e6"),
      when(col("hu_e6") + col("hv_e6") === 0L, lit(1.0d))
        .otherwise(floor6(lit(2.0d) * col("mi_e6").cast("double") / denom))
        .as("nmi"))
  }

  private def floor6(c: org.apache.spark.sql.Column) =
    floor(c * lit(1000000.0d) + lit(0.5d)) / lit(1000000.0d)
}
