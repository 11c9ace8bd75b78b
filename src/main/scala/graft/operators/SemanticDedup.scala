package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.cosine

/** SemDeDup-style semantic deduplication over an embedding column: cluster
  * the corpus with a coarse k-means quantizer, compare vectors only WITHIN
  * a cluster, and drop every vector that has a higher-similarity twin with
  * a smaller id (keep-first retention, same convention as exact dedup).
  *
  * Where `Similarity.cosineNearDupPairs` buckets by random hyperplanes,
  * the SemDeDup recipe clusters by data geometry — near-duplicates land in
  * the same cluster with high probability even when they straddle a random
  * hyperplane. Scale shape mirrors the IVF index: the iterative fit runs on
  * a bounded sample, assignment is one broadcast-centroid pass, the
  * within-cluster self-join is capped per cluster (dense clusters degrade
  * to bounded recall loss, never a quadratic blowup).
  */
object SemanticDedup {

  /** Near-duplicate pairs (id1 < id2, cosine ≥ threshold) found within
    * shared k-means clusters.
    */
  def pairs(
      df: DataFrame,
      threshold: Double = 0.95,
      nClusters: Int = 16,
      seed: Long = 42L,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      maxClusterSize: Int = 10000,
      trainFraction: Double = 1.0,
      maxIter: Int = 10
  ): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val vec = df.select(col(idCol), col(vecCol),
      array_to_vector(transform(col(vecCol), x => x.cast("double"))).as("features"))
    val train =
      if (trainFraction >= 1.0) vec
      else vec.sample(withReplacement = false, trainFraction, seed)
    val model = new KMeans().setK(nClusters).setSeed(seed)
      .setInitMode("random").setMaxIter(maxIter)
      .setFeaturesCol("features").setPredictionCol("cluster_id")
      .fit(train)
    val assigned = model.transform(vec)
      .select(col(idCol), col(vecCol), col("cluster_id"))
    pairsWithin(assigned, threshold, idCol, vecCol, maxClusterSize)
  }

  /** Near-duplicate pairs within pre-assigned clusters (a frame carrying a
    * `cluster_id` column). Split out so the threshold/pairing math has a
    * deterministic-assignment twin that a SQL oracle can hash-match — the
    * k-means assignment itself is engine-specific.
    */
  def pairsWithin(
      assigned: DataFrame,
      threshold: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      maxClusterSize: Int = 10000
  ): DataFrame = {
    // Oversized clusters are TRUNCATED to their maxClusterSize smallest ids
    // (not dropped whole): the self-join stays bounded quadratic while the
    // retained rows keep finding their duplicates — dropping the entire
    // cluster would lose recall precisely where duplicates are densest.
    val capped = assigned
      .withColumn("_cr",
        row_number().over(Window.partitionBy(col("cluster_id")).orderBy(col(idCol))))
      .filter(col("_cr") <= maxClusterSize)
      .drop("_cr")
    val l = capped.select(col("cluster_id"), col(idCol).as("id1"), col(vecCol).as("v1"))
    val r = capped.select(col("cluster_id"), col(idCol).as("id2"), col(vecCol).as("v2"))
    // each id lives in exactly one cluster, so every (id1, id2) pair is
    // produced at most once — no dedup aggregation needed (unlike the
    // multi-bucket LSH pairs, which must groupBy)
    l.join(r, Seq("cluster_id"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), cosine(col("v1"), col("v2")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** The fully-deterministic SemDeDup pipeline (the hash-oracled twin of
    * [[dedup]]): [[KMeansReplay]] geometry clustering → within-cluster
    * cosine pairs → keep-first survivor counts per `labelCol`.
    *
    * Materialization discipline (this query was the bench's slowest at
    * 2× the field): the corpus union and the quantized point table are
    * persisted ONCE and shared by the seed scan, every Lloyd round and
    * the final assignment, and the assignment is localCheckpoint'ed
    * eagerly before [[pairsWithin]] — whose cap-window plus self-join
    * otherwise re-executes the whole k-means assignment DAG once per
    * join side. Everything here is bounded (the corpus is a contract-
    * sized subset; centers are a k×d driver object), so the checkpoint
    * is a few thousand rows.
    */
  def dedupDeterministicSurvivors(
      spark: org.apache.spark.sql.SparkSession,
      corpus: DataFrame,
      labelCol: String,
      d: Int,
      k: Int,
      rounds: Int,
      threshold: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    // KMeansReplay's point table is keyed `vec_id`; rename at the boundary
    // so any idCol works (guarding the one collision that rename can't fix)
    require(idCol == "vec_id" || !corpus.columns.contains("vec_id"),
      "corpus already has a vec_id column; pass idCol = \"vec_id\"")
    val c = corpus.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pts = KMeansReplay.quantize(
        if (idCol == "vec_id") c else c.withColumnRenamed(idCol, "vec_id"), vecCol, d)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val centers = KMeansReplay.trainedCenters(spark, pts, k, rounds)
      val assigned = KMeansReplay.assign(spark, pts, centers)
        .select(col("vec_id").as(idCol), col("cid").as("cluster_id"))
        .join(c, Seq(idCol))
        .localCheckpoint(true)
      val drop = pairsWithin(assigned, threshold, idCol, vecCol)
        .select(col("id2").as(idCol)).distinct()
      // eager: the |labels|-row result is checkpointed so BOTH persists can
      // be released here instead of leaking one cached corpus per call
      c.join(drop, Seq(idCol), "left_anti")
        .groupBy(col(labelCol)).agg(count(lit(1)).as("n_survivors"))
        .localCheckpoint(true)
    } finally { pts.unpersist(); c.unpersist() }
  }

  /** The deduplicated corpus: every row of `df` that does NOT have a
    * detected twin with a smaller id (greedy keep-first — an id is dropped
    * if ANY smaller id is near-identical, whether or not that smaller id
    * itself survived; identical semantics to Dedup's exact keep-first).
    */
  def dedup(
      df: DataFrame,
      threshold: Double = 0.95,
      nClusters: Int = 16,
      seed: Long = 42L,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      maxClusterSize: Int = 10000,
      trainFraction: Double = 1.0,
      maxIter: Int = 10
  ): DataFrame = {
    val drop = pairs(df, threshold, nClusters, seed, idCol, vecCol,
      maxClusterSize, trainFraction, maxIter)
      .select(col("id2").as(idCol)).distinct()
    df.join(drop, Seq(idCol), "left_anti")
  }
}
