package graft

/** Dev utility: time one or more `SparkEntry.queries` entries at a given
  * SF dir with the Bench session shape (local[32]), Bench's per-query
  * cache hygiene, and a one-pass sf0.001 JVM warmup per query.
  * `sbt "runMain graft.TimeQ /root/testdata/sf0.1 q_kcore q_pagerank"`.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val dir = args.head
    args.tail.foreach { name =>
      val q = SparkEntry.queries(name)
      q(spark, "/root/testdata/sf0.001").count()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      val t0 = System.nanoTime
      val n = q(spark, dir).count()
      println(f"[timeq] $name rows=$n time=${(System.nanoTime - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
