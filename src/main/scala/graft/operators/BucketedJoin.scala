package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Money

/** Bucketed co-located join — the storage-layout answer to the join
  * shuffle: write both sides `bucketBy(n, key)` (+ in-bucket sort), then
  * an equi-join on the bucket key needs NO exchange on either side; the
  * scan itself delivers the join partitioning. At 100 TB this converts
  * the dominant cost of a repeated fact⋈dim join from a full network
  * shuffle per run into a one-time layout decision at write time — the
  * standard warehouse trick (Hive bucketing / Spark `bucketBy`), and the
  * reason `spark.sql.sources.bucketing.enabled` exists.
  *
  * The operator materializes the bucketed layout in the session catalog
  * (in-memory catalog; files under `spark.sql.warehouse.dir`), re-reads
  * through the catalog so the bucket spec attaches to the scan, and runs
  * the join MERGE-hinted (a broadcastable dim would otherwise take the
  * broadcast path and prove nothing about the layout). BucketedJoinSpec
  * pins the plan: zero ShuffleExchange below the join.
  *
  * The aggregate after the join (one tiny group) shuffles normally — the
  * claim is about the join inputs, not the rollup.
  */
object BucketedJoin {

  /** Revenue by market segment through a bucket-co-located
    * orders⋈customer join. Output: `c_mktsegment`, `n_orders`, `revenue`.
    */
  /** Per-session table suffix: fixed shared names in the shared warehouse
    * would let a concurrent graft session clobber the files this session
    * is about to lazily read.
    */
  private def mySuffix(spark: SparkSession): String =
    "_" + spark.sparkContext.applicationId.replaceAll("[^a-zA-Z0-9]", "_")

  private def tbl(spark: SparkSession, base: String): String =
    base + mySuffix(spark)

  /** GC: per-session names never self-overwrite, so dead sessions'
    * graft_bkt_* directories would otherwise accumulate in the shared
    * warehouse forever. Sweep ones that are both foreign (not this
    * session's suffix) and cold (mtime > 6h). "Cold" is a true liveness
    * signal because every session registers a [[Heartbeat]] that
    * re-touches its own graft_bkt_* dirs every 30 min (r19 ADVICE: write
    * mtime alone would let a concurrent sweep delete tables a long-lived
    * session is still lazily reading).
    */
  private def ensureHeartbeat(spark: SparkSession): Unit = {
    val mine = mySuffix(spark)
    Heartbeat.register("graft_bkt" + mine) { () =>
      val wh = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))
      val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(wh))
        fs.listStatus(wh).foreach { st =>
          val n = st.getPath.getName
          if (n.startsWith("graft_bkt_") && n.endsWith(mine))
            fs.setTimes(st.getPath, System.currentTimeMillis, -1)
        }
    }
  }

  private def sweepStale(spark: SparkSession): Unit = {
    val wh = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(wh)) return
    val mine = mySuffix(spark)
    val cutoff = System.currentTimeMillis - 6L * 3600 * 1000
    fs.listStatus(wh).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith("graft_bkt_") && !n.endsWith(mine)
          && st.getModificationTime < cutoff)
        fs.delete(st.getPath, true)
    }
  }

  /** Drop the catalog entry AND its physical location: a fresh JVM has an
    * empty in-memory catalog but inherits the previous run's warehouse
    * files, and `saveAsTable` refuses a managed-table location that
    * already exists (LOCATION_ALREADY_EXISTS).
    */
  private def reset(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val path = new org.apache.hadoop.fs.Path(s"$wh/$table")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) fs.delete(path, true)
  }

  def segmentRevenue(
      spark: SparkSession,
      orders: DataFrame,
      customer: DataFrame,
      buckets: Int = 8
  ): DataFrame = {
    val ordersTbl = tbl(spark, "graft_bkt_orders")
    val custTbl = tbl(spark, "graft_bkt_customer")
    ensureHeartbeat(spark)
    sweepStale(spark)
    reset(spark, ordersTbl)
    reset(spark, custTbl)
    orders.select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .write.bucketBy(buckets, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").format("parquet").saveAsTable(ordersTbl)
    customer.select(col("c_custkey"), col("c_mktsegment"))
      .write.bucketBy(buckets, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").format("parquet").saveAsTable(custTbl)
    val o = spark.table(ordersTbl)
    val c = spark.table(custTbl).hint("merge")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        Money.moneySum(col("o_totalprice")).as("revenue"))
  }

  /** Bucket-pruned point lookup: an equality filter on the bucket key
    * scans ONE bucket of `buckets` (`SelectedBucketsCount: 1 out of 8` in
    * the plan — BucketedJoinSpec pins it). At 100 TB this is the
    * difference between touching 1/N of the files and all of them for
    * every keyed probe. Output: `c_custkey`, `c_name`, `c_mktsegment`.
    */
  def prunedLookup(
      spark: SparkSession,
      customer: DataFrame,
      custkey: Long,
      buckets: Int = 8
  ): DataFrame = {
    val probeTbl = tbl(spark, "graft_bkt_probe")
    ensureHeartbeat(spark)
    sweepStale(spark)
    reset(spark, probeTbl)
    customer.select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .write.bucketBy(buckets, "c_custkey")
      .mode("overwrite").format("parquet").saveAsTable(probeTbl)
    spark.table(probeTbl).filter(col("c_custkey") === custkey)
  }
}
