package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregation by STATE MERGE — the "merge, never rescan"
  * discipline that makes periodic statistics affordable at 100 TB: keep a
  * per-group STATE table of decomposable aggregates (count, sum, min,
  * max, HLL registers), aggregate ONLY each new ingest batch, and combine
  * by the aggregates' own merge functions. Yesterday's corpus is never
  * rescanned; the state is O(|groups|·registers) regardless of corpus
  * size. (The reference's dashboard refresh recomputes from the full
  * event table each cycle — reference: src/streaming/stream_processor.py
  * metrics path; this is the scalable replacement.)
  *
  * Everything here is associative + commutative BY CONSTRUCTION:
  * count/sum add, min/max lattice-join, and distinct-count state is the
  * engine-portable [[HllReplay]] register table (register-wise MAX — the
  * same merge a 1000-executor tree aggregation performs). That makes
  * "merge ≡ recompute from scratch" an exact, hash-checkable identity —
  * the q_incremental_stats oracle computes the statistics DIRECTLY over
  * the full corpus in DuckDB and must hash-match the Spark side's
  * two-half merge, HLL estimate included.
  */
object IncrementalAgg {

  /** Scalar state per group over a BIGINT value column:
    * `(g, n, sum_v, mn, mx)`.
    */
  def scalarState(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    df.groupBy(col(groupCol).as("g"))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("sum_v"),
        min(col(valueCol)).as("mn"), max(col(valueCol)).as("mx"))

  /** Merge two scalar-state tables (groups absent from one side pass
    * through — sum/min/max ignore the missing half's nulls).
    */
  def mergeScalarStates(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("g"))
      .agg(sum(col("n")).as("n"), sum(col("sum_v")).as("sum_v"),
        min(col("mn")).as("mn"), max(col("mx")).as("mx"))

  /** Merge two [[HllReplay.registers]] tables — register-wise MAX, the
    * HLL union.
    */
  def mergeRegisterStates(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("g"), col("reg"))
      .agg(max(col("m")).as("m"))

  /** End-to-end incremental statistics: per-group scalar stats AND an HLL
    * distinct estimate for `old ∪ delta`, computed by aggregating each
    * half separately and MERGING STATES — the union of raw rows is never
    * re-aggregated. Output `(group_key, n, sum_v, mn, mx, nz, est_e6)`.
    */
  def mergedStats(
      old: DataFrame,
      delta: DataFrame,
      groupCol: String,
      valueCol: String,
      itemCol: String): DataFrame = {
    val sc = mergeScalarStates(
      scalarState(old, groupCol, valueCol),
      scalarState(delta, groupCol, valueCol))
    val regs = mergeRegisterStates(
      HllReplay.registers(old, itemCol, groupCol),
      HllReplay.registers(delta, itemCol, groupCol))
    sc.join(HllReplay.estimate(regs), Seq("g"))
      .select(col("g").as("group_key"), col("n"), col("sum_v"), col("mn"),
        col("mx"), col("nz"), col("est_e6"))
  }
}
