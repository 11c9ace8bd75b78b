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

  /** Compare layouts. With >1 layout whose order columns are all integral,
    * the layouts are scored in ONE fused pass (r21, guide §2.4): the
    * per-layout spelling ran a full [[fileStats]] pipeline per layout —
    * one scan + one ranged persist + one window + one zone-map aggregation
    * EACH — over the same input. The fused path tags each row with every
    * layout's order key via one explode (1 scan, |layouts|·N rows), then
    * runs a single layout-partitioned prefix rank (the [[PrefixSum]]
    * construction with `_lay` prepended to every partition/order key, so
    * the telescoping argument is unchanged per layout), one zone-map
    * aggregation and one predicate battery. Row-for-row identical output:
    * per layout the rank, file split, min/max and battery are the same
    * expressions over the same order (integral casts to long are
    * order-preserving — the reason for the integral guard; non-integral
    * layouts fall back to the per-layout path).
    */
  def report(
      df: DataFrame,
      layouts: Seq[(String, Seq[String])],
      fileRows: Int,
      statCols: Seq[String],
      preds: Seq[RangePred]
  ): DataFrame = {
    val integral: Set[org.apache.spark.sql.types.DataType] = Set(
      org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
    val fieldType = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val fusable = layouts.length > 1 &&
      layouts.flatMap(_._2).distinct.forall(c => fieldType.get(c).exists(integral))
    if (fusable) reportFused(df, layouts, fileRows, statCols, preds)
    else layouts.map { case (name, ord) =>
      pruning(fileStats(df, ord, fileRows, statCols), name, preds)
    }.reduce(_ unionByName _)
  }

  private def reportFused(
      df: DataFrame,
      layouts: Seq[(String, Seq[String])],
      fileRows: Int,
      statCols: Seq[String],
      preds: Seq[RangePred]
  ): DataFrame = {
    require(fileRows > 0, "fileRows must be positive")
    require(statCols.nonEmpty, "need at least one stat column")
    require(preds.nonEmpty, "need at least one predicate")
    // order columns are renamed into _k<i> slots, but stat columns keep
    // their names inside the struct — they must not shadow the internal ones
    require(statCols.forall(c => !c.startsWith("_")),
      "stat columns must not start with '_' (reserved for _lay/_pid/_k*)")
    val m = layouts.map(_._2.length).max
    val keyNames = (1 to m).map(i => s"_k$i")
    // one struct per layout: layout index + long-cast order keys (padded
    // with constant nulls to the max arity — constants can't affect the
    // per-layout order) + the stat columns
    val structs = layouts.zipWithIndex.map { case ((_, ord), i) =>
      val keys = ord.map(c => col(c).cast("long")) ++
        Seq.fill(m - ord.length)(lit(null).cast("long"))
      val fields = Seq(lit(i).as("_lay")) ++
        keys.zip(keyNames).map { case (k, kn) => k.as(kn) } ++
        statCols.map(c => col(c).as(c))
      struct(fields: _*)
    }
    val tagged = df
      .select(explode(array(structs: _*)).as("_r"))
      .select(col("_r.*"))
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    val ordCols = keyNames.map(col)
    // persisted for the same correctness reason as PrefixSum.runningTotal:
    // the offsets branch and the main branch must see the SAME sampled
    // range boundaries (lifecycle identical — harness clears per query)
    val ranged = tagged
      .repartitionByRange(n, (col("_lay") +: ordCols): _*)
      .withColumn("_pid", org.apache.spark.sql.functions.spark_partition_id())
      .persist()
    val within = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_pid"), col("_lay")).orderBy(ordCols: _*)
    val offs = ranged.groupBy(col("_pid"), col("_lay"))
      .agg(count(lit(1)).as("_psum"))
      .withColumn("_off", coalesce(
        sum(col("_psum")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("_lay")).orderBy(col("_pid"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("_pid"), col("_lay"), col("_off"))
    val aggs = statCols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    val stats = ranged
      .withColumn("_cum", row_number().over(within).cast("long"))
      .join(broadcast(offs), Seq("_pid", "_lay"))
      .withColumn("file_id", expr(s"(_off + _cum - 1) DIV $fileRows"))
      .groupBy(col("_lay"), col("file_id"))
      .agg(aggs.head, aggs.tail: _*)
    val kvs = preds.map { p =>
      struct(lit(p.name).as("pred"),
        (col(s"max_${p.column}") < p.lo || col(s"min_${p.column}") > p.hi)
          .as("pruned"))
    }
    val layName = layouts.zipWithIndex.foldLeft(lit(null).cast("string")) {
      case (acc, ((name, _), i)) => when(col("_lay") === i, lit(name)).otherwise(acc)
    }
    stats.select(col("_lay"), explode(array(kvs: _*)).as("kv"))
      .groupBy(col("_lay"), col("kv.pred").as("pred"))
      .agg(count(lit(1)).as("n_files"),
        sum(when(col("kv.pruned"), 1L).otherwise(0L)).as("n_pruned"))
      .select(layName.as("layout"), col("pred"), col("n_files"),
        col("n_pruned"),
        expr("n_pruned * 1000000 DIV n_files").as("pruned_micros"))
  }
}
