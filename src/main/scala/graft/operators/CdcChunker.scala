package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-defined chunking — the shift-tolerant document splitter used by
  * dedup storage systems (LBFS/FastCDC family): a chunk boundary is cut
  * after character position i whenever a hash of the trailing `w`-gram
  * `text[i-w+1 .. i]` lands in a target residue class (`% divisor == 0`),
  * so the EXPECTED chunk length is `divisor` characters and boundaries
  * depend only on local content. Insert or delete a prefix and every
  * boundary further than `w` characters past the edit re-appears at its
  * shifted position — fixed-size chunking would misalign every chunk after
  * the edit, defeating chunk-level dedup.
  *
  * The gram hash is the first 48 bits of md5 (cross-engine stable — the
  * [[HashSplit]] draw), not a rolling polynomial: O(n·w) hash work per
  * document instead of O(n), bought deliberately so the full pipeline is
  * SQL-oracled; at `w` = 8 the constant is small and the work is
  * embarrassingly parallel. Pure projection + explode — zero shuffles,
  * scales with input splits. Chunks are reported as (start, len, md5):
  * chunk-level exact dedup downstream is a plain groupBy on `chunk_md5`.
  *
  * Plain CDC, no min/max chunk clamps: clamping suppresses boundaries
  * based on the PREVIOUS accepted boundary, a sequential dependency that
  * would serialize the per-document scan; the residue class already sets
  * the expected size. A pathological run of boundary grams yields short
  * chunks rather than wrong ones.
  *
  * Reference scope: the reference has no chunker; SURVEY §2.12 extension
  * (storage/dedup prep alongside [[SubstringDedup]] and [[Chunker]]).
  */
object CdcChunker {

  /** 48-bit md5 prefix of the trailing w-gram ending at 1-based position
    * `i` — the boundary draw, exposed for the spec.
    */
  private def gramHash(text: Column, i: Column, w: Int): Column =
    conv(substring(md5(substring(text, i - (w - 1), lit(w))), 1, 12), 16, 10)
      .cast("long")

  /** (idCols..., chunk_idx, start_pos, chunk_len, chunk_md5) — one row per
    * chunk, `start_pos` 1-based, chunks covering the document exactly.
    * Documents shorter than `w + 1` characters yield one whole-doc chunk
    * (no position has a full trailing gram strictly before the end).
    */
  def chunks(
      docs: DataFrame,
      idCols: Seq[String],
      textCol: String,
      w: Int = 8,
      divisor: Int = 64
  ): DataFrame = {
    require(w >= 2, s"gram width $w must be >= 2")
    require(divisor >= 2, s"divisor $divisor must be >= 2")
    val keyC = idCols.map(col)
    val n = length(col("_t"))
    // candidate cut positions are [w, n-1]: a cut at i ends a chunk at i,
    // so excluding i = n keeps the tail chunk nonempty; sequence() runs
    // DESCENDING when the bound is inverted — guard short docs explicitly
    val idx = when(n >= w + 1, sequence(lit(w), n - 1))
      .otherwise(array().cast("array<int>"))
    // bind _cuts as its own projection: it is referenced twice below and a
    // HOF lambda re-evaluates its body per element (SubstringDedup lesson)
    val withCuts = docs
      .select(keyC :+ col(textCol).as("_t"): _*)
      .select(keyC ++ Seq(
        col("_t"),
        filter(idx, i => gramHash(col("_t"), i, w) % divisor === 0)
          .as("_cuts")): _*)
    val starts = concat(array(lit(1)), transform(col("_cuts"), c => c + 1))
    val ends = concat(col("_cuts"), array(length(col("_t"))))
    withCuts
      .select(keyC ++ Seq(col("_t"), starts.as("_s"), ends.as("_e")): _*)
      .select(keyC ++ Seq(
        col("_t"),
        explode(transform(sequence(lit(1), size(col("_s"))), j =>
          struct(
            j.as("i"),
            element_at(col("_s"), j).as("st"),
            element_at(col("_e"), j).as("en")))).as("_c")): _*)
      .select(keyC ++ Seq(
        col("_c.i").cast("long").as("chunk_idx"),
        col("_c.st").cast("long").as("start_pos"),
        (col("_c.en") - col("_c.st") + 1).cast("long").as("chunk_len"),
        md5(substring(col("_t"), col("_c.st"), col("_c.en") - col("_c.st") + 1))
          .as("chunk_md5")): _*)
  }
}
