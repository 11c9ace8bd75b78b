package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Length-bucketed batch packing efficiency — the padding-waste report
  * behind the standard NLP "sort by length, then batch" trick (dynamic
  * batching; public recipe in every seq2seq training stack): a batch pads
  * every member to its longest sequence, so batching in arrival order
  * wastes max−len tokens per doc, while batching in length order makes
  * near-equal-length batches and collapses the waste. Reference behavior:
  * the batch-shaping step of the reference's training-data pipeline
  * ([[Packing]] is the concat-and-split sibling; this is the pad-and-batch
  * one).
  *
  * Contract (all-integer until one replayed division): rank docs by the
  * strategy's total order, batch_id = (rank−1) DIV m, per-batch padding =
  * m′·max_len − Σlen (m′ = actual batch size — the tail batch is short),
  * overhead = total_padding / total_tokens floored to 6 decimals.
  *
  * Scale shape: ranks come from the distributed [[PrefixSum]] (range
  * partitions + offset telescope — never a single-partition window);
  * everything after is a two-level groupBy. One scan, two bounded
  * aggregations per strategy.
  */
object Batching {

  /** (strategy, n_batches, total_tokens, total_padding, overhead) for the
    * "arrival" (doc-id order) and "length_sorted" ((len, id) order)
    * strategies, batches of `m`.
    */
  def paddingReport(
      docs: DataFrame,
      m: Int = 32,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    require(m >= 1, s"batch size $m must be >= 1")
    val lens = docs.select(
      col(idCol),
      TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tokens"))
    def report(strategy: String, orderCols: Seq[String]): DataFrame =
      PrefixSum.runningTotal(
        lens.withColumn("_one", lit(1L)), orderCols, "_one", "_rk")
        // DIV: Spark's `/` on longs is true division; operands non-negative
        // so DIV ≡ floor ≡ DuckDB `//`
        .withColumn("_batch", expr(s"(_rk - 1) DIV $m"))
        .groupBy(col("_batch"))
        .agg(count(lit(1)).as("_bn"), max(col("n_tokens")).as("_bmax"),
          sum(col("n_tokens")).as("_bsum"))
        .agg(
          count(lit(1)).as("n_batches"),
          sum(col("_bsum")).as("total_tokens"),
          sum(col("_bn") * col("_bmax") - col("_bsum")).as("total_padding"))
        .select(
          lit(strategy).as("strategy"),
          col("n_batches"), col("total_tokens"), col("total_padding"),
          (floor(col("total_padding").cast("double") / col("total_tokens").cast("double")
            * lit(1000000.0d) + lit(0.5d)) / lit(1000000.0d)).as("overhead"))
    report("arrival", Seq(idCol))
      .unionAll(report("length_sorted", Seq("n_tokens", idCol)))
  }
}
