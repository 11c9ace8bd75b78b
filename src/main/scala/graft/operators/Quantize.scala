package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Symmetric int8 scalar quantization for embedding columns — the standard
  * 4× compression for billion-vector ANN serving: per vector, scale =
  * max|x|/127 and code_i = round(x_i/scale) ∈ [−127, 127], so the vector
  * reconstructs to within scale/2 per element and similarity math runs on
  * integers. Every step is order-independent (max, not sum) and integer
  * dot products are exact in doubles, so quantization AND quantized cosine
  * reproduce bit-for-bit in any engine (q_quantize_int8 /
  * q_knn_int8_subset hash-match DuckDB).
  *
  * Built entirely from codegen'd higher-order functions (`transform` /
  * `aggregate`) — zero shuffle, zero UDFs; at 100 TB this is a projection
  * you fold into the embedding scan, and downstream ANN (IVF posting
  * lists, windowed kNN) runs over arrays a quarter the size with
  * exact-integer kernels.
  */
object Quantize {

  /** Per-vector scale: max|x| / 127 (0.0 for the zero vector — max, so
    * partition-order-independent, unlike a float sum).
    */
  def int8Scale(v: Column): Column =
    aggregate(transform(v, x => abs(x.cast("double"))), lit(0.0),
      (a, x) => greatest(a, x)) / lit(127.0)

  /** Codes: round-half-up x/scale clamped to [−127, 127]; all zeros when
    * scale is 0. `floor(x/s + 0.5)` is the engine-portable rounding
    * spelling (Spark `round` and DuckDB `round` disagree on negative
    * halves; floor does not).
    */
  def int8Codes(v: Column, scale: Column): Column =
    transform(v, x =>
      when(scale === 0.0, lit(0))
        .otherwise(greatest(lit(-127), least(lit(127),
          floor(x.cast("double") / scale + lit(0.5)).cast("int")))))

  /** Attach `scaleCol` and `codesCol` for `vecCol`. */
  def withInt8(
      df: DataFrame,
      vecCol: String,
      codesCol: String = "q_codes",
      scaleCol: String = "q_scale"
  ): DataFrame =
    df.withColumn(scaleCol, int8Scale(col(vecCol)))
      .withColumn(codesCol, int8Codes(col(vecCol), col(scaleCol)))

  /** Dequantize: x̂_i = code_i · scale (max abs error ≤ scale/2). */
  def dequantize(codes: Column, scale: Column): Column =
    transform(codes, c => c.cast("double") * scale)
}
