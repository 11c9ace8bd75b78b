package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Zone-map pruning estimator: quantifies how many FILES a range predicate
  * can skip under a given physical layout — the observable that justifies
  * (or refutes) a Z-order/Hilbert clustered rewrite before paying for it.
  *
  * Every columnar lake format keeps per-file min/max statistics ("zone
  * maps"; Parquet row-group stats, Iceberg/Delta manifest ranges) and
  * prunes a file when its [min, max] interval misses the predicate range.
  * How much that prunes depends entirely on LAYOUT: insertion order gives
  * near-full min/max spans on every non-time column (nothing prunes);
  * Z-order gives tight spans on every clustered dimension. This operator
  * simulates the write (global order → fixed rows-per-file split), builds
  * the zone maps, and scores a predicate battery per layout, so the
  * "clustered writes prune every dimension" claim in [[graft.sources.Sinks]]
  * is a measured number instead of folklore.
  *
  * Scale shape: one [[PrefixSum.runningTotal]] global rank per layout (no
  * single-partition window), one groupBy(file_id) for the zone maps —
  * the stats table is `n_rows / fileRows` rows, orders of magnitude
  * smaller than the data — and the predicate battery is an explode over
  * that small table. Exact integers end to end.
  */
object ZoneMaps {

  /** Closed range predicate [lo, hi] on an integer column (point query:
    * lo == hi).
    */
  final case class RangePred(name: String, column: String, lo: Long, hi: Long)

  /** Simulated-file zone maps: rows are laid out in `orderCols` order and
    * cut every `fileRows` rows; output is one row per file with
    * min_/max_ for each stat column. `orderCols` must be a total order
    * (include a unique tie-break) or file assignment is nondeterministic.
    */
  def fileStats(
      df: DataFrame,
      orderCols: Seq[String],
      fileRows: Int,
      statCols: Seq[String]
  ): DataFrame = {
    require(fileRows > 0, "fileRows must be positive")
    require(statCols.nonEmpty, "need at least one stat column")
    val ranked = PrefixSum.runningTotal(
      df.withColumn("_one", lit(1L)), orderCols, "_one", "_rk")
    val aggs = statCols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    ranked
      .withColumn("file_id", expr(s"(_rk - 1) DIV $fileRows"))
      .groupBy(col("file_id"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Score the predicate battery against one layout's zone maps:
    * (layout, pred, n_files, n_pruned, pruned_micros). A file is pruned
    * when max < lo or min > hi.
    */
  def pruning(stats: DataFrame, layout: String, preds: Seq[RangePred]): DataFrame = {
    require(preds.nonEmpty, "need at least one predicate")
    val kvs = preds.map { p =>
      struct(lit(p.name).as("pred"),
        (col(s"max_${p.column}") < p.lo || col(s"min_${p.column}") > p.hi)
          .as("pruned"))
    }
    stats.select(explode(array(kvs: _*)).as("kv"))
      .groupBy(col("kv.pred").as("pred"))
      .agg(count(lit(1)).as("n_files"),
        sum(when(col("kv.pruned"), 1L).otherwise(0L)).as("n_pruned"))
      .select(lit(layout).as("layout"), col("pred"), col("n_files"),
        col("n_pruned"),
        expr("n_pruned * 1000000 DIV n_files").as("pruned_micros"))
  }

  /** Compare layouts: one [[pruning]] block per (name, orderCols) layout,
    * unioned.
    */
  def report(
      df: DataFrame,
      layouts: Seq[(String, Seq[String])],
      fileRows: Int,
      statCols: Seq[String],
      preds: Seq[RangePred]
  ): DataFrame =
    layouts.map { case (name, ord) =>
      pruning(fileStats(df, ord, fileRows, statCols), name, preds)
    }.reduce(_ unionByName _)
}
