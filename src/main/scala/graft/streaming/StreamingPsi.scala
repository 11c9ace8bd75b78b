package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Live drift alarm — [[graft.operators.Psi]]'s streaming twin: PSI of
  * each micro-batch's bucket distribution against a FROZEN reference
  * histogram (the training-time distribution), computed inside
  * `foreachBatch` (the StreamJob.processBatch plane), so a pipeline can
  * gate ingestion the moment a feed shifts instead of discovering it at
  * the next batch audit.
  *
  * Same replay discipline as the batch operator: Laplace-smoothed
  * distributions, every term exact-integer with one e6-quantized ln,
  * terms provably non-negative (diff and ln share a sign), a B-bucket
  * exact sum. The reference ships as a driver map (B entries — bounded by
  * construction); each batch costs one map-side-combined groupBy over the
  * batch plus B-row arithmetic.
  */
object StreamingPsi {

  private def e6ln(num: Long, den: Long): Long =
    math.floor(math.log(num.toDouble / den.toDouble) * 1e6 + 0.5).toLong

  /** 1-row frame `(n_rows, psi_e6)`: PSI of `batch`'s `bucketCol`
    * distribution (integer buckets in [0, nBuckets)) vs `refCounts`
    * (missing buckets count 0).
    */
  def psiVsReference(
      batch: DataFrame,
      bucketCol: String,
      refCounts: Map[Int, Long],
      nBuckets: Int
  ): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= 1000, "nBuckets in 2..1000")
    val spark = batch.sparkSession
    import spark.implicits._
    val B = nBuckets
    val nr = (0 until B).map(b => refCounts.getOrElse(b, 0L)).sum
    require(nr > 0, "reference histogram must be non-empty")
    val counts = batch.groupBy(col(bucketCol).cast("int").as("b"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nb = counts.values.sum
    val psi = (0 until B).map { b =>
      val cb = counts.getOrElse(b, 0L)
      val rc = refCounts.getOrElse(b, 0L)
      val diffNum = (cb + 1L) * (nr + B) - (nb + B) * (rc + 1L)
      val ln = e6ln((cb + 1L) * (nr + B), (nb + B) * (rc + 1L))
      diffNum * ln / ((nb + B) * (nr + B))
    }.sum
    Seq((nb, psi)).toDF("n_rows", "psi_e6")
  }

  /** Reference histogram from a (static) training frame — the map a
    * deployment freezes next to the model artifact.
    */
  def referenceOf(df: DataFrame, bucketCol: String): Map[Int, Long] =
    df.groupBy(col(bucketCol).cast("int").as("b")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

  /** foreachBatch wiring: append one `(batch_id, n_rows, psi_e6)` row per
    * micro-batch to an in-memory/KV sink via the provided writer.
    */
  def monitor(
      spark: SparkSession,
      stream: DataFrame,
      bucketCol: String,
      refCounts: Map[Int, Long],
      nBuckets: Int
  )(write: DataFrame => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      write(psiVsReference(batch, bucketCol, refCounts, nBuckets)
        .withColumn("batch_id", lit(batchId))
        .select(col("batch_id"), col("n_rows"), col("psi_e6")))
    }
}
