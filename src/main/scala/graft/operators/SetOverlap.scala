package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Audience-overlap estimation between groups from COORDINATED bottom-k
  * samples (Cohen & Kaplan 2007; the Broder min-wise estimator
  * generalized to bottom-k): per group keep the k members with the
  * smallest md5-48 draw, and for any group pair estimate
  *   - Jaccard: of the k smallest draws of the UNION of the two samples,
  *     the fraction present in both — sound because a member of the
  *     union's bottom-k that belongs to A is necessarily in A's bottom-k
  *     (its draw is among the k smallest of a superset);
  *   - union cardinality: invert the k-th order statistic of the union
  *     sample — E[h_(k)] ≈ k/(n+1)·2⁴⁸, so n̂ = (k−1)·2⁴⁸/h_(k); when the
  *     union sample is smaller than k it IS the whole union (exact);
  *   - intersection cardinality: Jaccard × union.
  * This is the set-operation capability HLL fundamentally lacks
  * (register-max unions only — no intersections), and the reason
  * coordinated samples sit next to HLL in the sketch family.
  *
  * Deterministic md5 draws ⇒ the samples, the order statistic, and every
  * estimate replay bit-for-bit in the SQL oracle — the estimates
  * themselves hash-check, not just an error bound. Exact audit columns
  * come from the full data (evaluation cost, the [[IvfReplay.exactKnn]]
  * convention — drop them in production and the full-data pass disappears).
  *
  * Scale shape: one distinct projection (group, member), one bottom-k
  * window per group (hash exchange on the group key); everything pairwise
  * runs on the |groups|·k sample table (broadcast pair fan-out — group
  * pairs never touch the corpus). Samples merge like [[QuantileSketch]]'s:
  * bottom-k of shard bottom-ks ≡ direct bottom-k.
  */
object SetOverlap {

  private val HashSpace = 281474976710656L // 2^48

  /** Pairwise overlap estimates: one row per unordered group pair
    * `(group_a, group_b, k_used, jacc_est_e6, union_est, inter_est,
    * exact_jacc_e6, exact_union)`.
    */
  def pairOverlaps(
      df: DataFrame,
      groupCol: String,
      memberCol: String,
      k: Int = 256): DataFrame = {
    require(k >= 2, "k >= 2")
    val m = df.select(col(groupCol).cast("string").as("g"),
      col(memberCol).cast("string").as("member")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sample = m
      .withColumn("hk", HashSplit.md548(col("member")))
      .withColumn("sr", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("hk"), col("member"))))
      .filter(col("sr") <= k)
      .select(col("g"), col("member"), col("hk"))
    val pairs = broadcast(
      sample.select(col("g")).distinct().select(col("g").as("ga"))
        .crossJoin(sample.select(col("g")).distinct().select(col("g").as("gb")))
        .filter(col("ga") < col("gb")))
    // union of each pair's two samples, with side-membership flags: tag
    // every sample row once per pair it serves on either side, then merge
    // duplicate members (present in both samples) into one flagged row
    val sideA = pairs.join(sample.withColumnRenamed("g", "ga"), Seq("ga"))
      .select(col("ga"), col("gb"), col("member"), col("hk"),
        lit(1L).as("in_a"), lit(0L).as("in_b"))
    val sideB = pairs.join(sample.withColumnRenamed("g", "gb"), Seq("gb"))
      .select(col("ga"), col("gb"), col("member"), col("hk"),
        lit(0L).as("in_a"), lit(1L).as("in_b"))
    val unioned = sideA.unionByName(sideB)
      .groupBy(col("ga"), col("gb"), col("member"), col("hk"))
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
    val kept = unioned
      .withColumn("ur", row_number().over(
        Window.partitionBy(col("ga"), col("gb")).orderBy(col("hk"), col("member"))))
      .filter(col("ur") <= k)
    val est = kept.groupBy(col("ga"), col("gb"))
      .agg(count(lit(1)).as("k_used"),
        sum(col("in_a") * col("in_b")).as("n_both"),
        max(col("hk")).as("hk_top"))
      .select(col("ga"), col("gb"), col("k_used"),
        expr("n_both * 1000000 DIV k_used").as("jacc_est_e6"),
        when(col("k_used") < k, col("k_used"))
          .otherwise(expr(s"(k_used - 1) * ${HashSpace}L DIV greatest(hk_top, 1L)"))
          .as("union_est"))
      .withColumn("inter_est", expr("jacc_est_e6 * union_est DIV 1000000"))
    // exact audit from the full distinct sets
    val sizes = m.groupBy(col("g")).agg(count(lit(1)).as("sz"))
    val inter = m.select(col("g").as("ga"), col("member"))
      .join(m.select(col("g").as("gb"), col("member")), Seq("member"))
      .filter(col("ga") < col("gb"))
      .groupBy(col("ga"), col("gb"))
      .agg(count(lit(1)).as("n_inter"))
    val exact = pairs
      .join(sizes.select(col("g").as("ga"), col("sz").as("sz_a")), Seq("ga"))
      .join(sizes.select(col("g").as("gb"), col("sz").as("sz_b")), Seq("gb"))
      .join(inter, Seq("ga", "gb"), "left")
      .select(col("ga"), col("gb"),
        coalesce(col("n_inter"), lit(0L)).as("n_inter"),
        (col("sz_a") + col("sz_b") - coalesce(col("n_inter"), lit(0L)))
          .as("exact_union"))
      .withColumn("exact_jacc_e6", expr("n_inter * 1000000 DIV exact_union"))
    est.join(exact, Seq("ga", "gb"))
      .select(col("ga").as("group_a"), col("gb").as("group_b"), col("k_used"),
        col("jacc_est_e6"), col("union_est"), col("inter_est"),
        col("exact_jacc_e6"), col("exact_union"))
  }
}
