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
    * `sortedness_e6`. All candidates share ONE scan and ONE chunk-window
    * pass: the per-candidate (has-pair, is-sorted) INTEGER flags are
    * computed side by side over the same lag frame, stacked by an
    * explode (flags are type-uniform even when the candidates aren't),
    * and aggregated per candidate in one shuffle-light pass — a
    * per-candidate union would rescan and re-shuffle the input once per
    * column for an identical window spec.
    */
  def profile(
      df: DataFrame,
      orderCol: String,
      candidates: Seq[(String, Column)],
      chunkRows: Long = 1000L
  ): DataFrame = {
    require(candidates.nonEmpty, "need at least one candidate column")
    require(chunkRows > 0, "chunkRows must be positive")
    // integer DIV (orderCol is non-negative by contract): DuckDB CAST of
    // a double ROUNDS half-even, so the float-divide-then-cast spelling
    // would disagree at chunk boundaries — both engines use floor division
    val chunk = expr(s"$orderCol DIV $chunkRows")
    val w = Window.partitionBy(col("_chunk")).orderBy(col(orderCol))
    val base = df.select(
      Seq(col(orderCol), chunk.as("_chunk")) ++
        candidates.zipWithIndex.map { case ((_, kCol), i) => kCol.as(s"_k$i") }: _*)
    val lagged = candidates.indices.foldLeft(base) { (acc, i) =>
      acc.withColumn(s"_p$i", lag(col(s"_k$i"), 1).over(w))
    }
    val stacked = lagged.select(explode(array(
      candidates.zipWithIndex.map { case ((name, _), i) =>
        struct(lit(name).as("key"),
          when(col(s"_p$i").isNotNull, 1L).otherwise(0L).as("hp"),
          when(col(s"_p$i").isNotNull && col(s"_k$i") >= col(s"_p$i"), 1L)
            .otherwise(0L).as("st"))
      }: _*)).as("c"))
      .select(col("c.key").as("key"), col("c.hp").as("hp"), col("c.st").as("st"))
    stacked.groupBy(col("key"))
      .agg(sum(col("hp")).as("n_pairs"), sum(col("st")).as("n_sorted"))
      .select(col("key"), col("n_pairs"), col("n_sorted"),
        when(col("n_pairs") > 0,
          floor(col("n_sorted").cast("double") * lit(1000000.0) / col("n_pairs"))
            .cast("long")).as("sortedness_e6"))
  }
}
