package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.sources.Tables

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def media = Multimodal.toMediaTable(Tables(spark, TestSpark.Sf0001).documents)

  test("media table carries binary content with typed metadata") {
    val m = media
    assert(m.schema("content").dataType.typeName == "binary")
    val row = m.filter($"doc_id" === 0).collect()(0)
    assert(row.getAs[String]("media_type") == "image/png")
    assert(row.getAs[Array[Byte]]("content").nonEmpty)
  }

  test("feature extraction: deterministic stub vectors, L1-normalized, batched") {
    val f = Multimodal.extractFeatures(media, dim = 8, batchSize = 16)
    assert(f.count() == 500)
    val r = f.filter($"doc_id" === 0).collect()(0)
    val vec = r.getSeq[Float](r.fieldIndex("features"))
    assert(vec.length == 8)
    assert(math.abs(vec.sum - 1.0f) < 1e-4) // histogram normalized
    // deterministic: second run identical
    val r2 = Multimodal.extractFeatures(media, dim = 8).filter($"doc_id" === 0).collect()(0)
    assert(r2.getSeq[Float](r2.fieldIndex("features")) == vec)
  }

  test("frame sampling keeps every Nth fixed-size chunk") {
    val doc = Seq((1L, "image/png", Array.fill[Byte](100)(7))).toDF("doc_id", "media_type", "content")
    val frames = Multimodal.sampleFrames(doc, frameBytes = 32, everyN = 2).collect()
    // 100 bytes → chunks 0..3 (32,32,32,4); keep idx 0 and 2
    assert(frames.map(_.getAs[Int]("frame_idx")).sorted.sameElements(Array(0, 2)))
    assert(frames.find(_.getAs[Int]("frame_idx") == 0).get.getAs[Array[Byte]]("frame").length == 32)
  }

  test("metadata projection prunes the content column from the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-media").toString
    media.write.mode("overwrite").parquet(dir)
    val meta = Multimodal.mediaMeta(spark.read.parquet(dir))
    assert(meta.count() == 500)
    // n_bytes/sha256 need content; but a pure metadata projection must not:
    val plan = spark.read.parquet(dir).select("doc_id", "media_type")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema") && !plan.contains("content"))
  }
}
