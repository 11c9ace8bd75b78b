package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-key skew profiler — the pre-flight check before a corpus-scale
  * join or aggregation: per candidate key column, how many rows the
  * hottest key holds, how far that sits above the mean, and the salt
  * factor that would cap any single task at a target row count.
  *
  * At 100 TB the failure mode this catches is the straggler task: a
  * shuffle keyed on a column whose hottest value holds 10⁹ rows puts all
  * of them in one task no matter how many executors exist. The standard
  * fixes — salting ([[graft.SparkEntry]]'s q_salted_join spelling) or
  * AQE's skew-join split — both need the NUMBER this operator measures:
  * `salt_factor = ⌈max_key_rows / target⌉` is exactly the salt modulus
  * that bounds per-task work, and `skew_micros` (hottest/mean, ×10⁶) is
  * the alarm threshold a pipeline can gate on.
  *
  * Scale shape: one groupBy per profiled column (map-side combined) whose
  * per-key histogram immediately collapses into a 1-row summary — nothing
  * key-cardinality-sized ever leaves the aggregation. All outputs are
  * exact integers (micros fractions via floor division).
  */
object SkewProfile {

  /** (key_col, n_rows, n_keys, max_key_rows, avg_rows_micros, skew_micros,
    * salt_factor) for each candidate key column.
    */
  def profile(
      df: DataFrame,
      keyCols: Seq[String],
      targetRowsPerTask: Long = 1000000L
  ): DataFrame = {
    require(keyCols.nonEmpty, "profile at least one key column")
    require(targetRowsPerTask > 0, "target must be positive")
    keyCols.map { k =>
      df.groupBy(col(k)).agg(count(lit(1)).as("c"))
        .agg(sum(col("c")).as("n_rows"), count(lit(1)).as("n_keys"),
          max(col("c")).as("max_key_rows"))
        .select(lit(k).as("key_col"), col("n_rows"), col("n_keys"),
          col("max_key_rows"))
    }.reduce(_ unionByName _)
      .select(col("key_col"), col("n_rows"), col("n_keys"), col("max_key_rows"),
        expr("n_rows * 1000000 DIV n_keys").as("avg_rows_micros"),
        expr("max_key_rows * 1000000 DIV greatest(n_rows DIV n_keys, 1)")
          .as("skew_micros"),
        expr(s"(max_key_rows + ${targetRowsPerTask - 1}) DIV $targetRowsPerTask")
          .as("salt_factor"))
  }
}
