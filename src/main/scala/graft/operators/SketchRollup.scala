package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental distinct-count via mergeable HLL sketches (Spark's bundled
  * DataSketches functions): sketch ONCE at the finest granularity you will
  * ever need, store the binary sketches (a few KB per group), and answer
  * every coarser rollup — day→month, (type, hour)→type, →global — by
  * UNIONING sketches, never rescanning the fact table. This is the
  * pre-aggregation pattern that makes dashboard-style distinct counts
  * feasible over 100 TB: the expensive pass happens once per ingest batch,
  * and rollups run over |groups| rows.
  *
  * Dense-mode HLL register state is insertion-order-independent
  * (register = max), but DataSketches sketches START in sparse coupon mode
  * and get promoted during unions, so a rolled-up estimate can differ from
  * the direct one-pass sketch by a sub-percent amount at low cardinality
  * (measured ~0.9 % at n≈700; zero once dense). SketchRollupSpec pins the
  * rollup within 2 % of the direct sketch and within the standard ±5 % of
  * exact counts — the bound that actually matters for the pattern.
  */
object SketchRollup {

  /** One HLL sketch per `fineCols` group over `valueCol` (the frame to
    * persist — `hll` is the DataSketches binary).
    */
  def sketchBy(df: DataFrame, fineCols: Seq[String], valueCol: String): DataFrame =
    df.groupBy(fineCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol)).as("hll"))

  /** Roll stored sketches up to `coarseCols` (must be a subset of the
    * sketch frame's group columns) — an aggregate over sketch rows only.
    */
  def rollupEstimate(sketches: DataFrame, coarseCols: Seq[String]): DataFrame =
    sketches.groupBy(coarseCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("hll"))).as("approx_distinct"))

  /** Global estimate from stored sketches (no group columns). */
  def totalEstimate(sketches: DataFrame): DataFrame =
    sketches.agg(hll_sketch_estimate(hll_union_agg(col("hll"))).as("approx_distinct"))
}
