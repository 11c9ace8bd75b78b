package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — multi-dimensional data layout: interleave
  * the bits of two key columns so that sorting by the single z-key keeps
  * rows close in BOTH dimensions, and every parquet file then covers a
  * bounded rectangle of the key space. Footer min/max (zone maps) on the
  * ORIGINAL columns prune files for predicates on EITHER dimension — the
  * multi-column generalization of [[graft.sources.Sinks.writeRangeClustered]]
  * (one range-sorted column prunes only itself), and the public technique
  * behind lakehouse `OPTIMIZE ZORDER BY`.
  *
  * The key is pure integer shift/mask arithmetic (classic bit-spread), so
  * it is a zero-shuffle codegen'd projection AND reproduces exactly in any
  * engine — q_zorder_key hash-matches the same arithmetic in DuckDB.
  */
object ZOrder {

  /** Spread the low 16 bits of `c` to the even bit positions (0, 2, ..30). */
  private def spread16(c: Column): Column =
    Seq((8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L), (1, 0x55555555L))
      .foldLeft(c.cast("long")) { case (x, (s, mask)) =>
        x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(mask))
      }

  /** 32-bit Morton key of two 16-bit values: x on even bits, y on odd.
    * Inputs are clamped to 16 bits via `pmod(·, 65536)` so arbitrary
    * integer keys can't silently collide across the interleave.
    */
  def zkey2(x: Column, y: Column): Column =
    spread16(pmod(x.cast("long"), lit(65536L)))
      .bitwiseOR(shiftleft(spread16(pmod(y.cast("long"), lit(65536L))), 1))

  /** d-dimensional Morton key: bit i of dimension j lands at position
    * i·d + j, so sorting by the key keeps rows close in EVERY dimension at
    * once. The bit-by-bit spelling (d · bitsPerDim shift/mask terms, all
    * folded into one codegen'd integer expression) trades the 2-dim
    * magic-mask spread for generality; `zkeyN(Seq(x, y), 16)` produces the
    * identical key to [[zkey2]] (spec-pinned). Inputs clamp to bitsPerDim
    * bits via pmod; d · bitsPerDim must fit a signed long.
    */
  def zkeyN(cols: Seq[Column], bitsPerDim: Int = 16): Column = {
    val d = cols.length
    require(d >= 2, "zkeyN needs at least 2 dimensions")
    require(bitsPerDim >= 1 && d * bitsPerDim <= 63,
      s"d * bitsPerDim = ${d * bitsPerDim} must be in [2, 63]")
    val m = 1L << bitsPerDim
    val terms = for {
      (c, j) <- cols.zipWithIndex
      x = pmod(c.cast("long"), lit(m))
      i <- 0 until bitsPerDim
    } yield shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), i * d + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Z-order-clustered parquet: attach the z-key, range-partition and sort
    * by it, bound file size — each file then holds a contiguous z-range,
    * i.e. a bounded rectangle in (xCol, yCol). The `_zkey` column is kept
    * in the output (it is the clustering witness and costs 8 bytes/row);
    * readers that prune on xCol/yCol zone maps never need it.
    */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      xCol: String,
      yCol: String,
      nFiles: Int = 8,
      maxRecordsPerFile: Long = 0L
  ): Unit =
    writeKeyed(df, path, zkey2(col(xCol), col(yCol)), nFiles, maxRecordsPerFile)

  /** d-dimensional z-ordered parquet: same layout contract as the 2-dim
    * overload — each file holds a contiguous z-range, i.e. a bounded BOX in
    * every one of `keyCols`, so zone maps prune on ANY dimension.
    */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      keyCols: Seq[String],
      bitsPerDim: Int,
      nFiles: Int,
      maxRecordsPerFile: Long
  ): Unit =
    writeKeyed(df, path, zkeyN(keyCols.map(col), bitsPerDim), nFiles, maxRecordsPerFile)

  private def writeKeyed(
      df: DataFrame,
      path: String,
      zkey: Column,
      nFiles: Int,
      maxRecordsPerFile: Long
  ): Unit =
    df.withColumn("_zkey", zkey)
      .repartitionByRange(nFiles, col("_zkey"))
      .sortWithinPartitions(col("_zkey"))
      .write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)
}
