package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Hilbert-curve clustering key — [[ZOrder]]'s sibling with strictly better
  * locality: consecutive Hilbert indices are ALWAYS one grid step apart
  * (Morton jumps across the whole plane at power-of-two seams), so files
  * cut from a Hilbert-sorted layout cover tighter spatial boxes and zone
  * maps prune fewer false positives. The price is that the index is not a
  * plain bit-interleave: each 2-bit output digit depends on the quadrant
  * orientation accumulated so far (the classic xy2d rotate-and-flip loop).
  *
  * The loop is UNROLLED into one named projection per bit level — each
  * level's (x, y, d) state lands in its own column, referenced by the next
  * level as a plain attribute. Building the whole thing as a single folded
  * Column would duplicate the state subtree ~5× per level (5^bits nodes);
  * as named columns the plan stays linear and CollapseProject leaves it
  * alone (the defining expressions are non-cheap and multiply referenced).
  * Still a zero-shuffle codegen'd projection, and pure integer arithmetic
  * — the oracle replays the identical unrolled chain in DuckDB.
  *
  * Reference scope: the reference has no multi-dim layout; SURVEY §2.12
  * extension alongside [[ZOrder]] (which q_zorder_key pins).
  */
object Hilbert {

  /** Append `outCol` = Hilbert index of (xCol, yCol) on the 2^bits-square
    * grid. Inputs clamp to `bits` bits via pmod (the [[ZOrder.zkey2]]
    * contract); the index ranges over [0, 4^bits). Routes to the native
    * [[graft.expressions.HilbertOps]] kernel (one codegen'd expression
    * node); the unrolled Column spelling survives as [[withKeyUnrolled]]
    * — the parity-spec reference and the shape the DuckDB oracle replays.
    * Bit parity is pinned by HilbertSpec; if you change the kernel, rerun
    * the q_hilbert_key oracle at 3 SFs.
    */
  def withKey(
      df: DataFrame,
      xCol: String,
      yCol: String,
      outCol: String,
      bits: Int = 16
  ): DataFrame =
    df.withColumn(outCol,
      graft.expressions.HilbertOps.hilbert_key(col(xCol), col(yCol), bits))

  /** The pre-r16 unrolled per-bit-level projection chain — kept as the
    * kernel's parity reference (the `VectorFunctions.cosineHof` pattern).
    */
  private[graft] def withKeyUnrolled(
      df: DataFrame,
      xCol: String,
      yCol: String,
      outCol: String,
      bits: Int = 16
  ): DataFrame = {
    require(bits >= 1 && bits <= 31, s"bits $bits must be in [1, 31]")
    val n = 1L << bits
    val start = df
      .withColumn("_h_x", pmod(col(xCol).cast("long"), lit(n)))
      .withColumn("_h_y", pmod(col(yCol).cast("long"), lit(n)))
      .withColumn("_h_d", lit(0L))
    val looped = (bits - 1 to 0 by -1).foldLeft(start) { (acc, k) =>
      val rx = shiftright(col("_h_x"), k).bitwiseAND(lit(1L))
      val ry = shiftright(col("_h_y"), k).bitwiseAND(lit(1L))
      // bind rx/ry once per level: both feed d AND the rotation below
      val lvl = acc.withColumn("_h_rx", rx).withColumn("_h_ry", ry)
      val d = col("_h_d") +
        shiftleft((col("_h_rx") * 3).bitwiseXOR(col("_h_ry")), 2 * k)
      // rot(n, x, y, rx, ry): ry == 1 → identity; ry == 0 → swap, with a
      // full-grid point reflection first when rx == 1
      val x2 = when(col("_h_ry") === 1, col("_h_x"))
        .otherwise(when(col("_h_rx") === 1, lit(n - 1) - col("_h_y"))
          .otherwise(col("_h_y")))
      val y2 = when(col("_h_ry") === 1, col("_h_y"))
        .otherwise(when(col("_h_rx") === 1, lit(n - 1) - col("_h_x"))
          .otherwise(col("_h_x")))
      lvl.withColumn("_h_d2", d).withColumn("_h_x2", x2).withColumn("_h_y2", y2)
        .drop("_h_x", "_h_y", "_h_d", "_h_rx", "_h_ry")
        .withColumnRenamed("_h_d2", "_h_d")
        .withColumnRenamed("_h_x2", "_h_x")
        .withColumnRenamed("_h_y2", "_h_y")
    }
    looped.withColumnRenamed("_h_d", outCol).drop("_h_x", "_h_y")
  }

  /** Hilbert-clustered parquet: same layout contract as
    * [[ZOrder.writeZOrdered]] — each file holds a contiguous index range,
    * i.e. a tight box in (xCol, yCol); the `_hkey` witness column stays.
    */
  def writeClustered(
      df: DataFrame,
      path: String,
      xCol: String,
      yCol: String,
      bits: Int = 16,
      nFiles: Int = 8,
      maxRecordsPerFile: Long = 0L
  ): Unit =
    withKey(df, xCol, yCol, "_hkey", bits)
      .repartitionByRange(nFiles, col("_hkey"))
      .sortWithinPartitions(col("_hkey"))
      .write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)
}
