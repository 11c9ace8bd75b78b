package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Physical-sortedness profiler — measures how CLUSTERED a column is in
  * storage order, which is exactly what decides whether zonemap (min/max)
  * pruning will work on it: a column that is 99% sorted in file order
  * gives tight row-group ranges and deep skipping; a shuffled one gives
  * full-range zonemaps and zero skips. For each candidate column, the
  * fraction of ADJACENT row pairs (in `orderCol` order) that are
  * non-decreasing:
  *
  *   sortedness = #(x_{i+1} ≥ x_i) / #pairs
  *
  * Scale shape: rows are chunked by `orderCol div chunkRows` and the lag
  * runs per chunk — one shuffle on the chunk id, never a global window;
  * the ≤ (1/chunkRows) fraction of cross-chunk pairs is skipped (the
  * estimator's documented bias, negligible at chunkRows = 1000). Counts
  * are exact integers; the ratio is one floored e6 division.
  */
object Sortedness {

  /** One row per candidate column: `key`, `n_pairs`, `n_sorted`,
    * `sortedness_e6`.
    */
  def profile(
      df: DataFrame,
      orderCol: String,
      candidates: Seq[(String, Column)],
      chunkRows: Long = 1000L
  ): DataFrame = {
    require(candidates.nonEmpty, "need at least one candidate column")
    // integer DIV (orderCol is non-negative by contract): DuckDB CAST of
    // a double ROUNDS half-even, so the float-divide-then-cast spelling
    // would disagree at chunk boundaries — both engines use floor division
    val chunk = expr(s"$orderCol DIV $chunkRows")
    val w = Window.partitionBy(col("_chunk")).orderBy(col(orderCol))
    candidates.map { case (name, expr) =>
      df.select(col(orderCol), chunk.as("_chunk"), expr.as("_k"))
        .withColumn("_prev", lag(col("_k"), 1).over(w))
        .filter(col("_prev").isNotNull)
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("_k") >= col("_prev"), 1L).otherwise(0L)).as("n_sorted"))
        .select(lit(name).as("key"), col("n_pairs"), col("n_sorted"),
          floor(col("n_sorted").cast("double") * lit(1000000.0) / col("n_pairs"))
            .cast("long").as("sortedness_e6"))
    }.reduce(_ union _)
  }
}
