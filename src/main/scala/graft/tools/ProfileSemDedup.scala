package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only stage profiler for q_semantic_dedup_det (not part of the
  * driver contract): prints per-stage wall times so the fixed overhead can
  * be attributed (seed scan vs Lloyd rounds vs pairing joins).
  */
object ProfileSemDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(cores = 32, shufflePartitions = 32)
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val base = graft.sources.Tables(spark, sfDir).embeddings
      .select(col("vec_id"), col("embedding"), col("label"))
    val corpus = base.filter(col("vec_id") < 2000)
      .unionByName(base.filter(col("vec_id").between(1, 3))
        .select((-col("vec_id")).as("vec_id"), col("embedding"), col("label")))
    // warm: mirror Bench's sf0.001 entry warmup
    t("warmup entry")(graft.SparkEntry.entry(spark).write.format("noop").mode("overwrite").save())
    (1 to 2).foreach { rep =>
      val c = corpus.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val pts = graft.operators.KMeansReplay.quantize(c, "embedding", 64)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t(s"[$rep] materialize pts")(pts.count())
      val centers = t(s"[$rep] trainedCenters(3)")(
        graft.operators.KMeansReplay.trainedCentersProfiled(spark, pts, 8, 3))
      val assigned = t(s"[$rep] assign+join+ckpt")(
        graft.operators.KMeansReplay.assign(spark, pts, centers)
          .select(col("vec_id"), col("cid").as("cluster_id"))
          .join(c, Seq("vec_id"))
          .localCheckpoint(true))
      val drop = graft.operators.SemanticDedup.pairsWithin(assigned, 0.9)
        .select(col("id2").as("vec_id")).distinct()
      val out = t(s"[$rep] pairs+anti+agg")(
        c.join(drop, Seq("vec_id"), "left_anti")
          .groupBy(col("label")).agg(count(lit(1)).as("n_survivors"))
          .localCheckpoint(true))
      t(s"[$rep] noop write")(out.write.format("noop").mode("overwrite").save())
      pts.unpersist(); c.unpersist()
    }
    spark.stop()
  }
}
