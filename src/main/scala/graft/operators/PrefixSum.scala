package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global prefix sum — the running total of a value column in a
  * global order, WITHOUT the single-partition global window that
  * `Window.orderBy(...)` plans (every row through one task: the canonical
  * scale killer). Three bounded steps instead:
  *
  *   1. range-repartition by the order key (each partition owns a
  *      contiguous key range),
  *   2. cumulative sum WITHIN each partition (a partitioned window),
  *   3. add per-partition offsets — a cumulative sum over the
  *      numPartitions-row totals table, broadcast back.
  *
  * The output is independent of where the (sampled) range boundaries land:
  * offset + within-partition cumsum telescopes to the same global prefix
  * sum for any split of a fixed order. Cost is one extra hash exchange (the
  * within-partition window re-clusters on `_pid`) — the price of never
  * holding more than one partition's rows in a single task.
  *
  * The order key must be a total order (pass a unique tiebreaker as the
  * last column) and the value column non-null; ties would make per-row
  * prefixes order-dependent.
  */
object PrefixSum {

  def runningTotal(
      df: DataFrame,
      orderCols: Seq[String],
      valueCol: String,
      outCol: String = "running_total",
      numPartitions: Int = 0
  ): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    val n =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val ord = orderCols.map(col)
    // PERSISTED — correctness, not speed: the offsets branch and the main
    // branch below both read this frame, and they are only consistent if
    // they see the SAME range boundaries. Unpersisted, Spark's
    // ReuseExchange dedupes the two identical range exchanges; but over a
    // cached/persisted input that reuse can fail, each branch re-samples
    // its OWN boundaries, and the telescope breaks — ranks drift by
    // ±partition-skew (caught by the q_dsir_scores sf0.1 gate; the same
    // latent hazard sat under q_token_shards). Materializing the
    // partitioning once makes both branches read one InMemoryRelation
    // whose lineage holds one exchange. Lifecycle as SubstringDedup: the
    // returned frame consumes the cache lazily; Bench/Verify clearCache
    // per query.
    val ranged = df.repartitionByRange(n, ord: _*)
      .withColumn("_pid", spark_partition_id())
      .persist()
    val within = Window.partitionBy(col("_pid")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // per-partition totals: ≤ numPartitions rows, so the one
    // Window.orderBy here is over a bounded table by construction
    val offs = ranged.groupBy(col("_pid"))
      .agg(sum(col(valueCol)).as("_psum"))
      .withColumn("_off", coalesce(
        sum(col("_psum")).over(
          Window.orderBy(col("_pid")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("_pid"), col("_off"))
    ranged
      .withColumn("_cum", sum(col(valueCol)).over(within))
      .join(broadcast(offs), Seq("_pid"))
      .withColumn(outCol, (col("_off") + col("_cum")).cast("long"))
      .drop("_pid", "_cum", "_off", "_psum")
  }

  /** Contiguous budget shards: documents taken in `orderCols` order fill
    * shard 0 until `budget` of `valueCol` is consumed, then shard 1, and so
    * on — equal-budget training shards (tokens, bytes) from a deterministic
    * order, assigned by each row's START offset so a row straddling a
    * boundary belongs to the shard it begins in. Output adds `outCol`
    * (running total INCLUDING the row) and `shardCol`. Values must be
    * non-negative (shard ids come from truncating division).
    */
  def budgetShards(
      df: DataFrame,
      orderCols: Seq[String],
      valueCol: String,
      budget: Long,
      shardCol: String = "shard",
      outCol: String = "running_total",
      numPartitions: Int = 0
  ): DataFrame = {
    require(budget > 0, "budget must be positive")
    runningTotal(df, orderCols, valueCol, outCol, numPartitions)
      .withColumn(shardCol,
        floor((col(outCol) - col(valueCol)) / lit(budget.toDouble)).cast("long"))
  }
}
