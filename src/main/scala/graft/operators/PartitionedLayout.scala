package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hive-style partitioned layout + partition pruning — the third leg of
  * the storage-layout trio next to [[BucketedJoin]] (bucket pruning /
  * co-location) and the zonemap queries (row-group min/max skipping): a
  * `partitionBy(col)` write turns a low-cardinality filter column into
  * the DIRECTORY STRUCTURE, so an equality filter never opens the other
  * partitions' files at all (`PartitionFilters` in the scan,
  * PartitionedLayoutSpec pins it). At 100 TB this is the first line of
  * defense for every `WHERE event_type = …` query — file listing, not
  * file reading, scales with the predicate.
  *
  * The write lands under the session warehouse tmp dir, re-read by path;
  * the partition column round-trips through the directory encoding.
  */
object PartitionedLayout {

  /** Write `df` partitioned by `partCol`, read it back filtered to
    * `value`, and aggregate — output: `event_type`, `n`, `n_users`,
    * `total_value_e6`.
    */
  def prunedAgg(
      spark: SparkSession,
      ev: DataFrame,
      partCol: String,
      value: String
  ): DataFrame = {
    // per-session directory: a fixed shared path would let a concurrent
    // graft session's overwrite race this session's lazy read-back.
    // GC cold foreign session dirs (mtime > 6h) so per-session names
    // don't accumulate forever in tmp; a Heartbeat daemon re-touches this
    // session's own dir every 30 min so "cold" means the owning JVM is
    // dead, not merely that the write happened > 6h ago (r19 ADVICE).
    val tmp = sys.props("java.io.tmpdir")
    val own = s"graft-partitioned-${spark.sparkContext.applicationId}"
    Heartbeat.register(own) { () =>
      val d = new java.io.File(tmp, own)
      if (d.exists) { d.setLastModified(System.currentTimeMillis); () }
    }
    val cutoff = System.currentTimeMillis - 6L * 3600 * 1000
    Option(new java.io.File(tmp).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("graft-partitioned-")
        && f.getName != own && f.lastModified < cutoff)
      .foreach { f =>
        val p = new org.apache.hadoop.fs.Path(f.getAbsolutePath)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      }
    val dir = s"$tmp/$own/events_by_type"
    ev.select(col("event_id"), col("user_id"), col("value"), col(partCol))
      .write.partitionBy(partCol).mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
      .filter(col(partCol) === value)
      .groupBy(col(partCol))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        sum(floor(col("value") * lit(1000000.0) + lit(0.5)).cast("long"))
          .as("total_value_e6"))
  }
}
