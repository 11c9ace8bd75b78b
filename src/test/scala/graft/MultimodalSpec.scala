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

  test("real PNG bytes decode to exact pixel statistics (javax.imageio path)") {
    // 2x2 image: red, green, blue, white — every stat hand-computable
    val img = new java.awt.image.BufferedImage(2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xFF0000); img.setRGB(1, 0, 0x00FF00)
    img.setRGB(0, 1, 0x0000FF); img.setRGB(1, 1, 0xFFFFFF)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray

    val f = Multimodal.extractFeatures(
      Seq((1L, "image/png", png)).toDF("doc_id", "media_type", "content"), dim = 11)
    val r = f.collect()(0)
    val vec = r.getSeq[Float](r.fieldIndex("features"))
    // each channel: two pixels at 255, two at 0 → mean 127.5, std 127.5
    val mean = (510.0 / 4 / 255.0).toFloat
    val std = (math.sqrt(130050.0 / 4 - 127.5 * 127.5) / 255.0).toFloat
    assert(vec(0) == mean && vec(1) == mean && vec(2) == mean, vec.toString)
    assert(vec(3) == std && vec(4) == std && vec(5) == std, vec.toString)
    assert(vec(6) == 0.5f) // 2 / (2 + 2)
    // luminance buckets (4 buckets of 64): lums = 76 (red), 149 (green),
    // 29 (blue), 255 (white) → buckets 1, 2, 0, 3 — one pixel each
    assert(vec.drop(7) == Seq(0.25f, 0.25f, 0.25f, 0.25f), vec.toString)
    assert(r.getAs[Int]("n_bytes") == png.length)
  }

  test("undecodable image bytes fall back to the stub (plumbing contract)") {
    val garbage = "definitely not a png".getBytes("UTF-8")
    val f = Multimodal.extractFeatures(
      Seq((1L, "image/png", garbage), (2L, "audio/wav", garbage))
        .toDF("doc_id", "media_type", "content"), dim = 8)
    val rows = f.collect().sortBy(_.getAs[Long]("doc_id"))
    val img = rows(0).getSeq[Float](rows(0).fieldIndex("features"))
    val aud = rows(1).getSeq[Float](rows(1).fieldIndex("features"))
    assert(img == aud) // same bytes, same stub vector
    assert(math.abs(img.sum - 1.0f) < 1e-4)
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

  test("real WAV bytes decode to exact signal statistics (javax.sound.sampled path)") {
    // 16-bit mono PCM square wave: 200 frames alternating +1000 / -1000 —
    // every stat hand-computable (mean|s| = rms = peak = 1000, zcr = 1)
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](400)
    for (i <- 0 until 200) {
      val s = if (i % 2 == 0) 1000 else -1000
      pcm(2 * i) = (s & 0xFF).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, 200L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    val wav = baos.toByteArray

    val vec = Multimodal.decodeAudio(wav, dim = 8).get
    val amp = (1000.0 / 32768.0).toFloat
    assert(vec(0) == amp && vec(1) == amp && vec(2) == amp, vec.toSeq.toString)
    assert(vec(3) == 1.0f) // every adjacent pair flips sign
    assert(vec(4) == (200.0 / (200.0 + 8000.0)).toFloat)
    // |1000| falls in bucket 1000*3/32768 = 0 of the 3-bucket histogram
    assert(vec.drop(5).toSeq == Seq(1.0f, 0f, 0f), vec.toSeq.toString)
    // dispatch: audio/* routes to the real decoder, garbage falls back
    val viaDispatch = Multimodal.extractFeatures(
      Seq((1L, "audio/wav", wav)).toDF("doc_id", "media_type", "content"), dim = 8)
      .collect()(0)
    assert(viaDispatch.getSeq[Float](viaDispatch.fieldIndex("features")) == vec.toSeq)
    val garbage = "not a wav".getBytes("UTF-8")
    assert(Multimodal.decodeAudio(garbage, 8).isEmpty)
  }

  test("real animated-GIF bytes decode as sampled video frames (ImageIO reader path)") {
    // 4 solid gray frames (64, 128, 192, 255) of 3x2 px; everyN=2 samples
    // frames 0 and 2 with exact luminance sums 6*64*1000 and 6*192*1000
    val baos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    for (g <- Seq(64, 128, 192, 255)) {
      val f = new java.awt.image.BufferedImage(3, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 2; x <- 0 until 3) f.setRGB(x, y, (g << 16) | (g << 8) | g)
      writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null)
    }
    writer.endWriteSequence(); ios.close(); writer.dispose()
    val gif = baos.toByteArray

    val fs = Multimodal.gifFrameStats(gif, everyN = 2).get
    assert(fs == Seq((0, 3, 2, 6L * 64 * 1000), (2, 3, 2, 6L * 192 * 1000)), fs.toString)

    // dispatch: a video/* row with GIF bytes takes the real path (marker 1.0)
    val vec = Multimodal.extractFeatures(
      Seq((1L, "video/gif", gif)).toDF("doc_id", "media_type", "content"), dim = 8)
      .collect()(0)
    val v = vec.getSeq[Float](vec.fieldIndex("features"))
    assert(v(0) == 2.0f && v(1) == 0.6f && v(3) == 1.0f, v.toString)
    assert(v(2) == ((6L * 64 * 1000 + 6L * 192 * 1000).toDouble / 12 / 255000.0).toFloat)
    // non-GIF video bytes stay on the stub (marker absent)
    assert(Multimodal.gifFrameStats("not a gif".getBytes("UTF-8")).isEmpty)
  }

  // ---- perceptual hashing ----

  private def pngBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("real-image dHash: hand-pinned monotone gradient sets every bit") {
    // 9x8 image, 1 pixel per grid block, gray value strictly DECREASING
    // left->right: every left block mean > right block mean -> all 64
    // difference bits set -> all four bands 0xFFFF
    val img = new java.awt.image.BufferedImage(9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 9) {
      val g = (8 - x) * 20
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bands = Multimodal.dHashImageBands(pngBytes(img)).get
    assert(bands.toSeq == Seq(0xFFFF, 0xFFFF, 0xFFFF, 0xFFFF))
    // increasing gradient: no strict > anywhere -> hash 0
    val inc = new java.awt.image.BufferedImage(9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 9) {
      val g = x * 20
      inc.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    assert(Multimodal.dHashImageBands(pngBytes(inc)).get.toSeq == Seq(0, 0, 0, 0))
  }

  test("real-image dHash: a one-pixel edit moves the hash by at most 2 bits") {
    // deterministic 90x80 texture; one pixel edit changes ONE block mean,
    // which participates in at most 2 horizontal comparisons
    def texture(edit: Boolean): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(90, 80, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 80; x <- 0 until 90) {
        val g = (x * 7 + y * 13) % 256
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      if (edit) img.setRGB(45, 40, 0xFFFFFF)
      pngBytes(img)
    }
    val a = Multimodal.dHashImageBands(texture(edit = false)).get
    val b = Multimodal.dHashImageBands(texture(edit = true)).get
    val hamming = a.zip(b).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
    assert(hamming <= 2, s"hamming $hamming")
  }

  test("stub dHash: byte append moves the hash by at most 2 bits; dispatch parity") {
    val bytes = ("some document text " * 20).getBytes("UTF-8")
    val a = Multimodal.dHashStubBands(bytes)
    val b = Multimodal.dHashStubBands(bytes :+ '!'.toByte)
    val hamming = a.zip(b).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
    assert(hamming <= 2, s"hamming $hamming")
    assert(a.forall(v => v >= 0 && v <= 0xFFFF))
    // non-image types and undecodable image bytes both take the stub path
    assert(Multimodal.dHashBands("audio/wav", bytes).toSeq == a.toSeq)
    assert(Multimodal.dHashBands("image/png", bytes).toSeq == a.toSeq)
  }

  test("nearest-neighbor resize: exact pixel picks down, exact replication up") {
    val img = new java.awt.image.BufferedImage(4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 4) img.setRGB(x, y, (y * 4 + x) * 0x010101)
    val down = Multimodal.resizeImage(img, 2, 2)
    assert(Seq(down.getRGB(0, 0), down.getRGB(1, 0), down.getRGB(0, 1), down.getRGB(1, 1))
      .map(_ & 0xFF) == Seq(0, 2, 8, 10))
    val up = Multimodal.resizeImage(down, 4, 4)
    // each source pixel becomes a 2x2 block
    assert((up.getRGB(0, 0) & 0xFF) == 0 && (up.getRGB(1, 1) & 0xFF) == 0)
    assert((up.getRGB(2, 0) & 0xFF) == 2 && (up.getRGB(3, 1) & 0xFF) == 2)
  }

  test("png round-trip sample: lossless codec chain returns the source bytes") {
    val content = (0 until 20).map(i => (i * 7 + 3).toByte).toArray
    val g = Multimodal.pngRoundTripSample(content)
    assert(g.toSeq == Seq(3, 17, 59, 73)) // bytes 0, 2, 8, 10 of (7i+3)
    // short content pads with zeros
    assert(Multimodal.pngRoundTripSample(Array[Byte](42)).toSeq == Seq(42, 0, 0, 0))
  }

  test("phash near-dup: planted 1-byte-perturbed twins are recovered") {
    val docs = Tables(spark, TestSpark.Sf0001).documents.select($"doc_id", $"text")
    val planted = docs.filter($"doc_id".isin(3, 6, 9))
      .select((-$"doc_id").as("doc_id"), concat($"text", lit("!")).as("text"))
    val pairs = Multimodal.phashNearDupPairs(Multimodal.toMediaTable(docs.unionByName(planted)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    for (k <- Seq(3L, 6L, 9L)) {
      val hit = pairs.find(p => p._1 == -k && p._2 == k)
      assert(hit.nonEmpty, s"planted pair (-$k, $k) not recovered: $pairs")
      assert(hit.get._3 <= 2, s"planted pair hamming ${hit.get._3}")
    }
  }

  test("mp4 box walker: synth round-trip recovers brand/timescale/duration/dims") {
    val bytes = Multimodal.synthMp4("mp42", 1000L, 48000L, 640, 360)
    val m = Multimodal.parseMp4Meta(bytes)
    assert(m === Some(Multimodal.Mp4Meta("mp42", 1000L, 48000L, 640, 360)))
  }

  test("mp4 box walker: v1 mvhd/tkhd layouts (64-bit times)") {
    // hand-built v1 boxes: mvhd v1 payload 112 B (ts at 20, dur 64-bit at
    // 24); tkhd v1 payload 96 B (width 16.16 at 88)
    def be32(v: Long) = Array(
      ((v >>> 24) & 0xFF).toByte, ((v >>> 16) & 0xFF).toByte,
      ((v >>> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def box(t: String, p: Array[Byte]) =
      be32(8L + p.length) ++ t.getBytes("ISO-8859-1") ++ p
    val mv = new Array[Byte](112)
    mv(0) = 1 // version
    System.arraycopy(be32(700L), 0, mv, 20, 4)
    System.arraycopy(be32(0L) ++ be32(99999L), 0, mv, 24, 8)
    val tk = new Array[Byte](96)
    tk(0) = 1
    System.arraycopy(be32(1280L << 16), 0, tk, 88, 4)
    System.arraycopy(be32(720L << 16), 0, tk, 92, 4)
    val ftyp = box("ftyp", "isom".getBytes("ISO-8859-1") ++ be32(0x200) ++ "isom".getBytes("ISO-8859-1"))
    val bytes = ftyp ++ box("moov", box("mvhd", mv) ++ box("trak", box("tkhd", tk)))
    val m = Multimodal.parseMp4Meta(bytes)
    assert(m === Some(Multimodal.Mp4Meta("isom", 700L, 99999L, 1280, 720)))
  }

  test("mp4 box walker: size-0 final box extends to end of file") {
    val full = Multimodal.synthMp4("mp42", 600L, 1200L, 320, 240)
    // zero out the moov box's size field (starts after the 20-byte ftyp)
    val patched = full.clone()
    patched(20) = 0; patched(21) = 0; patched(22) = 0; patched(23) = 0
    assert(Multimodal.parseMp4Meta(patched) ===
      Some(Multimodal.Mp4Meta("mp42", 600L, 1200L, 320, 240)))
  }

  test("mp4 box walker is total on adversarial input") {
    val full = Multimodal.synthMp4("mp42", 600L, 1200L, 320, 240)
    assert(Multimodal.parseMp4Meta(full.take(20)) === None) // truncated ftyp
    assert(Multimodal.parseMp4Meta(full.dropRight(7)) === None) // truncated tkhd
    assert(Multimodal.parseMp4Meta("not an mp4 at all".getBytes) === None)
    assert(Multimodal.parseMp4Meta(Array.empty[Byte]) === None)
    val badSize = full.clone() // moov size < 8 (but nonzero) => malformed
    badSize(20) = 0; badSize(21) = 0; badSize(22) = 0; badSize(23) = 5
    assert(Multimodal.parseMp4Meta(badSize) === None)
  }
}
