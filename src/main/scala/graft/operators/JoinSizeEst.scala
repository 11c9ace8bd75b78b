package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Equi-join SIZE estimation from coordinated key samples (Vengerov et
  * al., VLDB 2015 — correlated sampling for join estimation): the planner
  * question "how big is A ⋈ B on key k?" answered WITHOUT running the
  * join, from two per-side sketches that each side can build
  * independently in one pass.
  *
  * Method: both sides sample the SAME keys — a key is sampled iff its
  * md5-48 draw is among the k smallest in the UNION key domain (computed
  * by merging the two sides' bottom-k key sketches, the
  * [[SetOverlap]]/[[QuantileSketch]] discipline). Because the draw is a
  * pure function of the key, the samples are coordinated: a sampled key's
  * multiplicities a_i, b_i are known EXACTLY on both sides, so
  *   |A ⋈ B| = Σ_domain a_i·b_i ≈ (n̂_domain / k_used)·Σ_sampled a_i·b_i,
  * with n̂_domain inverted from the k-th order statistic ((k−1)·2⁴⁸/h_(k))
  * and exact when the domain is smaller than k. Uniform sampling of ROWS
  * cannot do this (it misses the a_i·b_i correlation — the heavy-key
  * terms that dominate join sizes); coordinating on KEYS keeps every
  * sampled key's full contribution.
  *
  * Deterministic draws ⇒ the estimate hash-replays in SQL; the `exact_*`
  * column audits against the true join size (evaluation cost — the real
  * join the estimator exists to avoid).
  *
  * Scale shape: per side one (key, multiplicity) aggregate + one bottom-k
  * window; the estimate runs on ≤ 2k sample rows. The sketches merge
  * across shards like every bottom-k here.
  */
object JoinSizeEst {

  private val HashSpace = 281474976710656L // 2^48

  /** One row: `(k_used, sampled_pairs, domain_est, join_size_est,
    * exact_join_size)` for the equi-join of `a` and `b` on their key
    * columns.
    */
  def estimate(
      a: DataFrame,
      keyA: String,
      b: DataFrame,
      keyB: String,
      k: Int = 256): DataFrame = {
    require(k >= 2, "k >= 2")
    val ka = a.select(col(keyA).cast("string").as("key"))
      .groupBy(col("key")).agg(count(lit(1)).as("cnt_a"))
    val kb = b.select(col(keyB).cast("string").as("key"))
      .groupBy(col("key")).agg(count(lit(1)).as("cnt_b"))
    val dom = ka.join(kb, Seq("key"), "full_outer")
      .select(col("key"),
        coalesce(col("cnt_a"), lit(0L)).as("cnt_a"),
        coalesce(col("cnt_b"), lit(0L)).as("cnt_b"),
        HashSplit.md548(col("key")).as("hk"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // global bottom-k as sort+limit — Spark plans TakeOrderedAndProject
    // (per-partition top-k, then a k-row driver merge), NEVER a
    // single-partition window over the key domain
    val kept = dom.orderBy(col("hk"), col("key")).limit(k)
    val est = kept.agg(
      count(lit(1)).as("k_used"),
      sum(col("cnt_a") * col("cnt_b")).as("sampled_pairs"),
      max(col("hk")).as("hk_top"))
    val exact = dom.agg(sum(col("cnt_a") * col("cnt_b")).as("exact_join_size"))
    est.crossJoin(exact)
      .select(col("k_used"), col("sampled_pairs"),
        when(col("k_used") < k, col("k_used"))
          .otherwise(expr(s"(k_used - 1) * ${HashSpace}L DIV greatest(hk_top, 1L)"))
          .as("domain_est"),
        col("exact_join_size"))
      .select(col("k_used"), col("sampled_pairs"), col("domain_est"),
        expr("sampled_pairs * domain_est DIV k_used").as("join_size_est"),
        col("exact_join_size"))
  }
}
