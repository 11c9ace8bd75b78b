package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-community dedup-quality audit — the "is this near-dup cluster
  * actually a duplicate family?" check a curation pipeline runs before
  * trusting cluster-level canonicalization: for every detected community
  * (e.g. [[LabelPropagation]] over the shingle graph), the exact pairwise
  * Jaccard over a CAPPED member sample. High mean intra-community Jaccard
  * = the clustering found real duplicate families; a low-mean community is
  * a bridge artifact (one stray shared shingle gluing unrelated docs) and
  * a candidate for splitting.
  *
  * Scale shape (the [[CoOccur]] cap discipline): per community at most
  * `capPerCommunity` members survive, chosen by md5 rank — deterministic,
  * engine-reproducible, and the pair fan-out is ≤ C(cap, 2) per community
  * BY CONSTRUCTION, so a degenerate 10⁶-member boilerplate cluster costs
  * the same as a 10-member one (never all-pairs). One shuffle for the cap
  * window, one self-join co-partitioned on the community, one aggregate.
  *
  * Exactness: per-pair Jaccard is one exact-integer division quantized to
  * e6 BEFORE the community sum (order-free BIGINT adds); the mean is one
  * fixed-spelling float chain, floor-6. Communities with fewer than 2
  * sampled members yield no pairs and are omitted (inner-join semantics,
  * mirrored by the oracle).
  */
object CommunityQuality {

  /** (community, n_members, n_sampled, n_pairs, sum_j_e6, min_j_e6,
    * mean_jaccard) per community with ≥ 1 sampled pair.
    * `communities`: (node, community) — [[LabelPropagation.communities]]'
    * shape; `docs` must carry (idCol, textCol).
    */
  def intraJaccard(
      docs: DataFrame,
      communities: DataFrame,
      capPerCommunity: Int = 8,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    require(capPerCommunity >= 2, "capPerCommunity must be at least 2")
    val mem = communities.select(col("node").as(idCol), col("community"))
      .join(docs.select(col(idCol), Dedup.shingles(col(textCol)).as("_sh")),
        Seq(idCol))
    // referenced three times below (both pair sides + the sampled count):
    // checkpoint so the shingle projection + cap window run once, not
    // three times (guide §2.4 duplicated subtrees)
    val capped = mem
      .withColumn("_r", row_number().over(
        Window.partitionBy(col("community"))
          .orderBy(HashSplit.md548(col(idCol)), col(idCol))))
      .filter(col("_r") <= capPerCommunity)
      .drop("_r")
      .localCheckpoint(true)
    val a = capped.select(col("community"), col(idCol).as("id1"), col("_sh").as("_sh1"))
    val b = capped.select(col("community"), col(idCol).as("id2"), col("_sh").as("_sh2"))
    val pairs = a.join(b, Seq("community"))
      .filter(col("id2") > col("id1"))
      .select(col("community"),
        floor(Dedup.jaccard(col("_sh1"), col("_sh2")) * lit(1000000.0d) + lit(0.5d))
          .cast("long").as("_j_e6"))
    val sizes = communities.groupBy(col("community")).agg(count(lit(1)).as("n_members"))
    val sampled = capped.groupBy(col("community")).agg(count(lit(1)).as("n_sampled"))
    pairs.groupBy(col("community"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("_j_e6")).as("sum_j_e6"),
        min(col("_j_e6")).as("min_j_e6"))
      .join(sizes, Seq("community"))
      .join(sampled, Seq("community"))
      .select(col("community"), col("n_members"), col("n_sampled"),
        col("n_pairs"), col("sum_j_e6"), col("min_j_e6"),
        (floor(col("sum_j_e6").cast("double") / col("n_pairs").cast("double")
          / lit(1000000.0d) * lit(1000000.0d) + lit(0.5d)) / lit(1000000.0d))
          .as("mean_jaccard"))
  }
}
