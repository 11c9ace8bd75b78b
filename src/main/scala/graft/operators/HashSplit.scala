package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic content-hash dataset splits (train/validation/test) — the
  * standard way a training pipeline assigns examples to splits so that
  * membership is stable across runs, machines, and data re-partitioning,
  * and so that exact duplicates always land in the SAME split (no
  * train/test leakage through copies).
  *
  * The bucket is the first two hex chars of md5(key) → 0..255, computed
  * with plain string/ascii arithmetic that evaluates identically in any
  * engine (the md5 hex spelling is cross-engine stable, unlike xxhash64 or
  * Spark's `hash`). Zero shuffle — a pure projection, safe at any scale.
  */
object HashSplit {

  /** Value of one lowercase hex char via ascii arithmetic (portable to SQL
    * engines that lack conv()).
    */
  private def hexVal(c: Column): Column =
    when(ascii(c) >= 97, ascii(c) - 87).otherwise(ascii(c) - 48)

  /** 0..255 bucket from the first two hex chars of md5(key). */
  def bucket(key: Column): Column = {
    val h = md5(key.cast("string"))
    hexVal(substring(h, 1, 1)) * 16 + hexVal(substring(h, 2, 1))
  }

  /** 48-bit integer from the first 12 hex chars of md5(key) — THE shared
    * engine-portable uniform hash (WeightedSample's race draw,
    * NegativeSampler's slot candidates, the portable fingerprint's token
    * hash all byte-match DuckDB's `('0x' || substring(md5(k),1,12))::BIGINT`
    * through this one spelling; 48 < 53 bits keeps it exact in doubles).
    */
  def md548(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 12), 16, 10).cast("long")

  /** Split label from bucket thresholds: bucket < trainUpTo → "train",
    * < valUpTo → "val", else "test". Defaults ≈ 80/10/10.
    */
  def split(key: Column, trainUpTo: Int = 205, valUpTo: Int = 230): Column = {
    val b = bucket(key)
    when(b < trainUpTo, lit("train")).when(b < valUpTo, lit("val")).otherwise(lit("test"))
  }

  /** Group k-fold assignment: fold = md5-bucket(key) mod k — every row
    * sharing the group key lands in ONE fold, the leak-free
    * cross-validation split for grouped data (all of a user's sessions
    * move together). Same zero-shuffle portable-hash spelling as
    * [[bucket]].
    */
  def fold(key: Column, k: Int): Column = {
    require(k >= 1, "k must be >= 1")
    pmod(bucket(key), lit(k))
  }

  /** Attach `bucket` and `split` columns keyed on `keyCol` (use the content
    * column, not a surrogate id, when duplicate texts must co-locate).
    */
  def assign(
      df: DataFrame,
      keyCol: String,
      trainUpTo: Int = 205,
      valUpTo: Int = 230
  ): DataFrame =
    df.withColumn("bucket", bucket(col(keyCol)))
      .withColumn("split", split(col(keyCol), trainUpTo, valUpTo))
}
