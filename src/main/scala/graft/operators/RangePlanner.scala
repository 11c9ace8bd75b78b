package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Range-partition layout planner — the sample → cut-points → assignment
  * recipe Spark's own `RangePartitioner` (and every distributed sort /
  * sorted-write) runs, surfaced as an auditable operator: plan balanced
  * range boundaries for a sort key from a deterministic sample, then
  * report how the FULL table actually lands in those ranges (row count,
  * key span, and load share per planned partition). At 100 TB this is the
  * difference between a sorted write with 1000 even files and one
  * straggler partition holding a hot key range — the planner makes the
  * imbalance visible before the shuffle is paid.
  *
  * Determinism: the sample is content-keyed (`md5₄₈(id) % sampleMod == 0`
  * — the HashSplit discipline, no RNG, engine-reproducible), cut points
  * are the ranks `floor(i·n/B)` of the SORTED sample (ties broken by the
  * id — exact), and duplicate boundary values collapse (DISTINCT), so a
  * hot key never splits across two planned partitions — exactly
  * RangePartitioner's contract.
  *
  * Scale shape: one pass to sample (zero-shuffle filter), one bounded
  * sort of the sample (≤ n/sampleMod rows), and the assignment is a
  * DRIVER-BOUNDED collect of ≤ B−1 boundary values folded into a
  * zero-shuffle bucket projection (`1 + Σ [key > bᵢ]` — the same
  * driver-side boundary array RangePartitioner itself broadcasts), then
  * ONE aggregate on the bucket id. The collect is metadata-sized by
  * construction (B−1 longs), the audited bounded-collect class.
  */
object RangePlanner {

  /** Per-planned-partition load report. Output: `bucket` (1-based),
    * `n_rows`, `min_key`, `max_key`, `share_e6` (row share in micros).
    */
  def plan(
      df: DataFrame,
      keyCol: String,
      idCol: String,
      numPartitions: Int = 32,
      sampleMod: Int = 20
  ): DataFrame = {
    require(numPartitions >= 2, "numPartitions must be >= 2")
    require(sampleMod >= 1, "sampleMod must be >= 1")
    val spark = df.sparkSession
    val keyed = df.select(col(keyCol).cast("long").as("k"), col(idCol).as("id"))

    val samp = keyed.filter(HashSplit.md548(col("id")) % sampleMod === 0)
    val nSamp = samp.count()
    // the sample rank is a GLOBAL window — legal only because the sample
    // is metadata-sized by contract (pick sampleMod ≈ n / (100·B)); fail
    // loudly rather than silently single-partition-sort a corpus-scale
    // sample (the Isotonic.calibrate guard discipline)
    require(nSamp <= 1000000L,
      s"RangePlanner sample has $nSamp rows (> 1e6): raise sampleMod so the " +
        "boundary sort stays metadata-sized")
    val ranked = samp
      .withColumn("_rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("k"), col("id"))))
    val cutRanks = (1 until numPartitions)
      .map(i => math.floor(i.toDouble * nSamp / numPartitions).toLong)
      .filter(_ >= 1L).distinct
    val boundaries: Array[Long] = ranked
      .filter(col("_rn").isInCollection(cutRanks))
      .select(col("k")).distinct()
      .collect().map(_.getLong(0)).sorted

    // zero-shuffle bucket projection from the driver-bounded boundary set
    val bucket = boundaries.foldLeft(lit(1L): Column) {
      (acc, b) => acc + when(col("k") > lit(b), 1L).otherwise(0L)
    }
    val perBucket = keyed
      .select(bucket.as("bucket"), col("k"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("k")).as("min_key"), max(col("k")).as("max_key"))
    val total = keyed.agg(count(lit(1)).as("_tot"))
    perBucket.crossJoin(broadcast(total))
      .select(col("bucket"), col("n_rows"), col("min_key"), col("max_key"),
        floor(col("n_rows").cast("double") * lit(1000000.0) / col("_tot"))
          .cast("long").as("share_e6"))
  }
}
