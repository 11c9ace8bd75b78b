package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only stage profiler for q_knn_ivfpq (not part of the driver
  * contract): attributes wall time to coarse fit vs residual-codebook
  * training vs the ADC scoring action.
  */
object ProfileIvfPq {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(cores = 32, shufflePartitions = 32)
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    t("warmup entry")(graft.SparkEntry.entry(spark).write.format("noop").mode("overwrite").save())
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    (1 to 2).foreach { rep =>
      val emb = graft.sources.Tables(spark, sfDir).embeddings
      val corpusVec = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv"),
        array_to_vector(transform(col("embedding"), _.cast("double"))).as("features"))
      val coarse = t(s"[$rep] coarse fit")(
        new KMeans().setK(8).setSeed(42L).setInitMode("random").setMaxIter(5)
          .setFeaturesCol("features").setPredictionCol("list_id").fit(corpusVec))
      val centroids = {
        import spark.implicits._
        coarse.clusterCenters.zipWithIndex.toSeq
          .map { case (c, i) => (i, c.toArray) }.toDF("list_id", "cv")
      }
      val posted = coarse.transform(corpusVec)
        .join(broadcast(centroids), Seq("list_id"))
        .select(col("neighbor_id"), col("list_id"),
          zip_with(transform(col("nv"), _.cast("double")), col("cv"), (x, c) => x - c).as("resid"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t(s"[$rep] materialize posted")(posted.count())
      val cb = t(s"[$rep] trainCodebooksDet")(
        graft.operators.ProductQuantization.trainCodebooksDet(
          posted, m = 4, k = 16, dim = 64, rounds = 3,
          idCol = "neighbor_id", vecCol = "resid"))
      t(s"[$rep] full query action")(
        graft.SparkEntry.queries("q_knn_ivfpq")(spark, sfDir)
          .write.format("noop").mode("overwrite").save())
      posted.unpersist()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      val _ = cb
    }
    spark.stop()
  }
}
