package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The shared bucket/block-cap idiom (r19 self-review: it had grown five
  * copy-pasted spellings across the pair generators): drop whole groups
  * larger than `maxRows` — bounded recall loss on degenerate keys
  * (boilerplate corpora, hot blocks), never a runaway quadratic join.
  * One windowed count per call; the window's hash partitioning is reused
  * by the equi-join that invariably follows on the same keys (pinned in
  * PlanSpec for the linkage family).
  */
private[graft] object Buckets {
  def cap(df: DataFrame, keys: Seq[String], maxRows: Int): DataFrame = {
    require(keys.nonEmpty, "bucket cap requires at least one key column")
    df.withColumn("_bucket_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(keys.map(col): _*)))
      .filter(col("_bucket_n") <= maxRows)
      .drop("_bucket_n")
  }
}
