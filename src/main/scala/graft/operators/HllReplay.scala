package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Engine-portable HyperLogLog (Flajolet et al. 2007) built on the repo's
  * shared md5-48 hash, so the WHOLE sketch — registers, the dyadic harmonic
  * sum, the raw and linear-counting estimates — replays bit-exactly in any
  * SQL engine. The deterministic twin of the `approx_count_distinct` paths
  * (q_hll_rollup / q_approx_distinct, engine-internal xxhash64 + HLL++ bias
  * tables, declared rows-only): same register semantics, fully oracled.
  *
  * Layout: p = 6 → m = 64 registers. For item hash h (48 bits, exact in a
  * double): register = h % 64 (low 6 bits), the remaining 42 bits rem =
  * h >> 6 give ρ = 43 − bits(rem) — the 1-based position of rem's highest
  * set bit from the MSB end of the 42-bit field (ρ = 43 when rem = 0).
  * bits() is spelled `length(bin(x))` — identical in Spark and DuckDB for
  * positive integers.
  *
  * Replay discipline: each register's 2^−M term is a dyadic rational, so
  * the harmonic sum is kept EXACT as Σ 2^(50−M) in BIGINT (M ≤ 43 → terms
  * ≥ 2^7; 64 registers ≤ 2^56, no overflow); unseen registers contribute
  * 2^50 each. The only float ops are the final α·m²·2^50 / sum division
  * (identical left-assoc spelling both engines) and the linear-counting
  * `m·ln(m/V)` ln — both e6-quantized at the end (the Zipf/NMI rule). The
  * small-range branch compares the already-quantized raw_e6 against the
  * integer 2.5·m·10⁶ threshold, so the branch itself is portable.
  *
  * Mergeability is part of the contract: the "ALL" row is built by
  * max-merging the per-group register tables (never by rescanning the
  * data), which is exactly how a 1000-executor rollup would combine
  * per-partition sketches — the oracle replays the merge the same way.
  *
  * Scale shape: one distinct-projection shuffle onto (group, item), one
  * map-side-combined groupBy onto at most |groups|·64 register cells; all
  * downstream arithmetic runs on the register table. Register state is
  * O(m) per group regardless of item cardinality.
  */
object HllReplay {

  /** α₆₄ from the HLL paper's α_m table (m = 64). Spliced as the single
    * shared literal into the DuckDB oracle (the Binomial.Z95 pattern).
    */
  val Alpha64 = 0.709

  private val M = 64
  private val Pow50 = 1125899906842624L // 2^50

  private def e6(c: Column): Column =
    floor(c * lit(1000000.0d) + lit(0.5d)).cast("long")

  /** Per-(group, register) max-ρ table: `(g, reg, m)` — ≤ |groups|·64 rows. */
  def registers(df: DataFrame, itemCol: String, groupCol: String): DataFrame = {
    val h = HashSplit.md548(col(itemCol))
    val rem = shiftright(h, 6)
    val rho = when(rem === 0L, lit(43L))
      .otherwise(lit(43L) - length(bin(rem)).cast("long"))
    df.select(col(groupCol).as("g"), (h % lit(64L)).as("reg"), rho.as("rho"))
      .groupBy(col("g"), col("reg"))
      .agg(max(col("rho")).as("m"))
  }

  /** (g, nz, est_e6) from a register table — shared with [[HyperBall]]. */
  private[operators] def estimate(regs: DataFrame): DataFrame = {
    val agg = regs.groupBy(col("g")).agg(
      count(lit(1)).as("nz"),
      sum(pow(lit(2.0d), lit(50L) - col("m")).cast("long")).as("s"))
    val raw = lit(Alpha64) * lit(4096.0d) * lit(Pow50.toDouble) /
      (col("s") + (lit(64L) - col("nz")) * lit(Pow50)).cast("double")
    val rawE6 = e6(raw)
    val lc = e6(lit(64.0d) * log(lit(64.0d) / (lit(64L) - col("nz")).cast("double")))
    agg.select(col("g"), col("nz"),
      when(rawE6 <= lit(160000000L) && col("nz") < lit(64L), lc)
        .otherwise(rawE6).as("est_e6"))
  }

  /** One row per group plus a max-merged "ALL" row:
    * `(group_key, exact_n, nz, est_e6)`. `exact_n` is the true distinct
    * count (the audit column); `nz` the occupied registers; `est_e6` the
    * HLL estimate (linear counting below the 2.5·m threshold).
    */
  def sketch(df: DataFrame, itemCol: String, groupCol: String): DataFrame = {
    // Four consumers (register build ×2, exact ×2) all read the distinct
    // (group, item) projection — persist it once; the register table itself
    // is ≤ |groups|·64 rows and recomputes from cache for pennies. The
    // Verify/Bench harness unpersists between queries.
    val it = df.select(col(groupCol).cast("string").as("g"),
      col(itemCol).cast("string").as("item")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val regs = registers(it, "item", "g")
    val merged = regs.groupBy(col("reg")).agg(max(col("m")).as("m"))
      .select(lit("ALL").as("g"), col("reg"), col("m"))
    val est = estimate(regs).unionByName(estimate(merged))
    val exact = it.groupBy(col("g")).agg(count(lit(1)).as("exact_n"))
      .unionByName(it.select(col("item")).distinct()
        .agg(count(lit(1)).as("exact_n")).select(lit("ALL").as("g"), col("exact_n")))
    est.join(exact, Seq("g"))
      .select(col("g").as("group_key"), col("exact_n"), col("nz"), col("est_e6"))
  }
}
