package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns for training-data pipelines.
  *
  * Media is carried as an opaque `binary` content column plus typed metadata
  * — the layout large-scale pipelines use so parquet scans can prune
  * metadata-only queries without touching the (huge) content bytes.
  *
  * The actual codec step is ⚠ STUBBED ⚠ (this container ships no image/audio
  * libraries): `decodeStub` derives a deterministic pseudo-feature vector
  * from the raw bytes. Everything around the stub — schema, binary column
  * handling, per-partition batched iteration, frame-sampling explode, the
  * feature-vector output shape — is the real distributed plumbing and is
  * tested. Swapping in a real decoder changes only the function body.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media_type: String, content: Array[Byte])
  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Int,
      features: Array[Float]
  )

  /** Synthesize a media table from any (id, text) frame — UTF-8 bytes stand
    * in for encoded media so the binary-column path is exercised end-to-end
    * on the driver-provided tables.
    */
  def toMediaTable(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame =
    df.select(
      col(idCol).as("doc_id"),
      element_at(
        array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")
      ).as("media_type"),
      encode(col(textCol), "UTF-8").as("content")
    )

  /** ⚠ STUB decode ⚠ — deterministic fake: byte-histogram folded into `dim`
    * buckets, L1-normalized. A real implementation decodes pixels/samples
    * here; the signature (bytes in, float vector out) is what a decoder
    * plugs into.
    */
  private[operators] def decodeStub(content: Array[Byte], dim: Int): Array[Float] = {
    val acc = new Array[Float](dim)
    var i = 0
    while (i < content.length) {
      acc(java.lang.Math.floorMod(content(i).toInt, dim)) += 1f
      i += 1
    }
    val total = math.max(1f, content.length.toFloat)
    var j = 0
    while (j < dim) { acc(j) /= total; j += 1 }
    acc
  }

  /** Per-partition batched feature extraction: rows stream through
    * `mapPartitions` in fixed-size batches (the shape a vectorized decoder —
    * GPU or SIMD — wants), never materializing a partition in memory.
    */
  def extractFeatures(media: DataFrame, dim: Int = 16, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val typed: Dataset[MediaRow] = media
      .select(col("doc_id"), col("media_type"), col("content"))
      .as[MediaRow]
    typed
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // a real decoder would process `batch` as one vectorized call
          batch.iterator.map { r =>
            MediaFeatures(r.doc_id, r.media_type, r.content.length, decodeStub(r.content, dim))
          }
        }
      }
      .toDF()
  }

  /** Video frame sampling plumbing: chunk the content into fixed-size
    * "frames" and keep every `everyN`-th — one output row per sampled frame
    * (the explode shape a real frame extractor produces).
    */
  def sampleFrames(
      media: DataFrame,
      frameBytes: Int = 32,
      everyN: Int = 4
  ): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, content) =>
        content.grouped(frameBytes).zipWithIndex.collect {
          case (frame, idx) if idx % everyN == 0 => (id, idx, frame)
        }
      }
      .toDF("doc_id", "frame_idx", "frame")
  }

  /** Metadata-only projection — must prune to a scan that never reads the
    * content column (verify via ReadSchema in `.explain`). Content length
    * and hash are computed Spark-side from the binary column.
    */
  def mediaMeta(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"),
      col("media_type"),
      length(col("content")).as("n_bytes"),
      sha2(col("content"), 256).as("sha256")
    )
}
