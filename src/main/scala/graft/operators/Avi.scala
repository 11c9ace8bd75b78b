package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Uncompressed-DIB AVI (RIFF) container walker + frame-grid decoder —
  * the codec-free close-out of the video-frame-decode stub: the JDK ships
  * no mp4/webm codec, but BI_RGB AVI frames are raw bottom-up BGR24
  * grids, so BOTH the container walk and the frame DECODE are pure byte
  * arithmetic (little-endian — the RIFF twin of [[Multimodal.parseMp4Meta]]'s
  * big-endian ISO BMFF walk).
  *
  * Structure walked: `RIFF('AVI ')` → `LIST('hdrl')` { `avih`
  * (frame timing, counts, dimensions) + `LIST('strl')` { `strh` (fccType
  * 'vids', handler) + `strf` (BITMAPINFOHEADER: dimensions, biBitCount,
  * biCompression) } } → `LIST('movi')` { `00db`/`00dc` frame chunks }.
  * Total on adversarial input: malformed size / truncation / missing box
  * → None (bounds-checked, depth-capped recursion); odd-sized chunks
  * honor the RIFF pad byte. Frame decode requires biCompression = 0
  * (BI_RGB) and biBitCount = 24; rows are STRIDE-padded to 4 bytes and
  * stored BOTTOM-UP — the per-frame x/y moments in [[frameStats]] flip if
  * either detail is decoded wrong, which is what the hex-replay oracle
  * pins (a plain pixel sum would be orientation-invariant).
  *
  * The reference has no video surface at all (SURVEY §2.12 multimodal
  * mandate); MJPG-fourcc AVIs decode for real too ([[synthMjpegAvi]] /
  * [[decodeMjpegFrameStats]] — each frame a standalone baseline JPEG the
  * JDK reads), so only INTER-FRAME-compressed codecs (H.264/VP9 in
  * mp4/webm) remain the declared stub: the JDK ships no codec for them.
  */
object Avi {

  final case class AviMeta(
      handler: String,
      microSecPerFrame: Long,
      totalFrames: Long,
      width: Long,
      height: Long,
      bitCount: Int,
      compression: Long)

  final case class FrameStat(frameIdx: Long, pxSum: Long, xMoment: Long, yMoment: Long)

  private val Iso = java.nio.charset.StandardCharsets.ISO_8859_1

  private def le32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
      ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

  private def putLe32(b: Array[Byte], off: Int, v: Long): Unit = {
    b(off) = (v & 0xFF).toByte
    b(off + 1) = ((v >>> 8) & 0xFF).toByte
    b(off + 2) = ((v >>> 16) & 0xFF).toByte
    b(off + 3) = ((v >>> 24) & 0xFF).toByte
  }

  private def putLe16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xFF).toByte
    b(off + 1) = ((v >>> 8) & 0xFF).toByte
  }

  private def tag(b: Array[Byte], off: Int): String = new String(b, off, 4, Iso)

  /** DIB row stride: w·3 bytes padded up to the next 4-byte boundary. */
  def stride(width: Int): Int = (width * 3 + 3) & ~3

  /** 'MJPG' as a little-endian BITMAPINFOHEADER biCompression fourcc —
    * Motion JPEG: each movi frame chunk is a standalone baseline JPEG.
    */
  val MjpgFourcc: Long =
    'M'.toLong | ('J'.toLong << 8) | ('P'.toLong << 16) | ('G'.toLong << 24)

  private def riffChunk(t: String, payload: Array[Byte]): Array[Byte] = {
    val pad = payload.length & 1
    val out = new Array[Byte](8 + payload.length + pad)
    System.arraycopy(t.getBytes(Iso), 0, out, 0, 4)
    putLe32(out, 4, payload.length.toLong)
    System.arraycopy(payload, 0, out, 8, payload.length)
    out
  }

  private def riffList(listType: String, children: Array[Byte]): Array[Byte] =
    riffChunk("LIST", listType.getBytes(Iso) ++ children)

  /** Shared RIFF assembly for the fixture writers: avih + vids strl
    * (strh handler + BITMAPINFOHEADER strf with the given biCompression)
    * + movi with one frame chunk per payload.
    */
  private def buildAvi(
      width: Int,
      height: Int,
      microSecPerFrame: Long,
      handler: String,
      biCompression: Long,
      biSizeImage: Long,
      frameChunkTag: String,
      framePayloads: Seq[Array[Byte]]): Array[Byte] = {
    val nFrames = framePayloads.length
    val avih = new Array[Byte](56)
    putLe32(avih, 0, microSecPerFrame)
    putLe32(avih, 16, nFrames.toLong)
    putLe32(avih, 24, 1L) // one stream
    putLe32(avih, 32, width.toLong)
    putLe32(avih, 36, height.toLong)

    val strh = new Array[Byte](56)
    System.arraycopy("vids".getBytes(Iso), 0, strh, 0, 4)
    System.arraycopy(handler.getBytes(Iso), 0, strh, 4, 4)
    putLe32(strh, 20, microSecPerFrame) // dwScale
    putLe32(strh, 24, 1000000L) // dwRate: rate/scale = fps
    putLe32(strh, 32, nFrames.toLong) // dwLength

    val strf = new Array[Byte](40) // BITMAPINFOHEADER
    putLe32(strf, 0, 40L)
    putLe32(strf, 4, width.toLong)
    putLe32(strf, 8, height.toLong) // positive: bottom-up
    putLe16(strf, 12, 1) // biPlanes
    putLe16(strf, 14, 24) // biBitCount
    putLe32(strf, 16, biCompression)
    putLe32(strf, 20, biSizeImage)

    val frames = framePayloads.map(riffChunk(frameChunkTag, _)).reduce(_ ++ _)
    val body = riffList("hdrl", riffChunk("avih", avih) ++
      riffList("strl", riffChunk("strh", strh) ++ riffChunk("strf", strf))) ++
      riffList("movi", frames)
    val riff = new Array[Byte](12 + body.length)
    System.arraycopy("RIFF".getBytes(Iso), 0, riff, 0, 4)
    putLe32(riff, 4, (4 + body.length).toLong)
    System.arraycopy("AVI ".getBytes(Iso), 0, riff, 8, 4)
    System.arraycopy(body, 0, riff, 12, body.length)
    riff
  }

  /** Minimal-but-real uncompressed AVI writer for fixtures: full RIFF
    * structure (avih + vids strl with a BITMAPINFOHEADER strf + movi with
    * one `00db` chunk per frame), bottom-up BGR24 rows, stride-padded.
    * `pixel(frame, y, x, channel)` supplies each sample (channel 0=B,
    * 1=G, 2=R; y is the IMAGE row, top-down — the writer does the
    * bottom-up placement).
    */
  def synthAvi(
      width: Int,
      height: Int,
      nFrames: Int,
      microSecPerFrame: Long,
      pixel: (Int, Int, Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0 && nFrames > 0, "positive dimensions")
    val st = stride(width)
    val payloads = (0 until nFrames).map { f =>
      val data = new Array[Byte](st * height)
      var y = 0
      while (y < height) {
        val rowOff = (height - 1 - y) * st // bottom-up storage
        var x = 0
        while (x < width) {
          var c = 0
          while (c < 3) {
            data(rowOff + x * 3 + c) = (pixel(f, y, x, c) & 0xFF).toByte
            c += 1
          }
          x += 1
        }
        y += 1
      }
      data
    }
    buildAvi(width, height, microSecPerFrame, "DIB ", 0L,
      (st * height).toLong, "00db", payloads)
  }

  /** Deterministic baseline-JPEG encode via the JDK writer (the
    * q_media_resize ImageIO recipe with an EXPLICIT quality so the bytes
    * — and therefore the decoded pixels — are a pure function of the
    * input grid on a given JDK).
    */
  private[graft] def encodeJpeg(img: java.awt.image.BufferedImage, quality: Float): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    val baos = new java.io.ByteArrayOutputStream()
    // MemoryCacheImageOutputStream, NOT createImageOutputStream: the
    // factory's default file cache would create and delete a temp file on
    // executor disk per encoded frame (r19 self-review)
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    } finally {
      writer.dispose()
      ios.close()
    }
    baos.toByteArray
  }

  /** Motion-JPEG AVI writer for fixtures: the same RIFF structure as
    * [[synthAvi]] but strh handler / strf biCompression = 'MJPG' and each
    * movi `00dc` chunk is a REAL baseline JPEG (JDK ImageIO encode at the
    * given explicit quality) of the formula grid — the codec pair the JDK
    * actually ships, closing the compressed-frame gap H.264/VP9 leave
    * open. `pixel(frame, y, x, channel)` as in [[synthAvi]] (0=B,1=G,2=R).
    */
  def synthMjpegAvi(
      width: Int,
      height: Int,
      nFrames: Int,
      microSecPerFrame: Long,
      quality: Float,
      pixel: (Int, Int, Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0 && nFrames > 0, "positive dimensions")
    val payloads = (0 until nFrames).map { f =>
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val b = pixel(f, y, x, 0) & 0xFF
          val g = pixel(f, y, x, 1) & 0xFF
          val r = pixel(f, y, x, 2) & 0xFF
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      encodeJpeg(img, quality)
    }
    buildAvi(width, height, microSecPerFrame, "MJPG", MjpgFourcc, 0L,
      "00dc", payloads)
  }

  /** Walk the container; returns the metadata plus the raw `00db`/`00dc`
    * frame payloads (decode happens in [[frameStats]]). None on any
    * malformed size, truncation, or missing required box.
    */
  private[graft] def parseAvi(
      content: Array[Byte]): Option[(AviMeta, Seq[Array[Byte]])] = {
    if (content.length < 12 || tag(content, 0) != "RIFF" ||
      tag(content, 8) != "AVI ") return None
    val riffSize = le32(content, 4)
    if (riffSize < 4L || 8L + riffSize > content.length) return None
    val end = (8L + riffSize).toInt

    var handler: String = null
    var uspf = -1L
    var totalFrames = -1L
    var w = -1L
    var h = -1L
    var bits = -1
    var comp = -1L
    var sawVids = false
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]

    def walk(start: Int, stop: Int, depth: Int, inMovi: Boolean): Boolean = {
      var pos = start
      while (pos < stop) {
        if (pos + 8 > stop) return false
        val t = tag(content, pos)
        val size = le32(content, pos + 4)
        if (size < 0L || pos + 8 + size > stop) return false
        val p = pos + 8
        t match {
          case "LIST" =>
            if (size < 4L) return false
            val lt = tag(content, p)
            if (depth < 4 &&
              !walk(p + 4, p + size.toInt, depth + 1, inMovi || lt == "movi"))
              return false
          case "avih" =>
            if (size < 40L) return false
            uspf = le32(content, p)
            totalFrames = le32(content, p + 16)
            w = le32(content, p + 32)
            h = le32(content, p + 36)
          case "strh" =>
            if (size < 8L) return false
            if (tag(content, p) == "vids") {
              sawVids = true
              if (handler == null) handler = tag(content, p + 4)
            }
          case "strf" =>
            if (sawVids && bits < 0) {
              if (size < 20L) return false
              // strf of the vids stream is a BITMAPINFOHEADER
              bits = le16(content, p + 14)
              comp = le32(content, p + 16)
            }
          case "00db" | "00dc" =>
            if (inMovi) frames += java.util.Arrays.copyOfRange(content, p, p + size.toInt)
          case _ => ()
        }
        pos += 8 + size.toInt + (size & 1L).toInt // RIFF pad byte
      }
      true
    }
    if (!walk(12, end, 0, inMovi = false)) return None
    if (handler == null || uspf < 0 || totalFrames < 0 || w <= 0 || h <= 0 ||
      bits < 0) None
    else Some((AviMeta(handler, uspf, totalFrames, w, h, bits, comp),
      frames.toSeq))
  }

  /** Decode one BI_RGB bottom-up BGR24 frame into per-frame exact-integer
    * stats: pxSum = Σ(B+G+R); xMoment = Σ(x+1)(B+G+R);
    * yMoment = Σ(y+1)(B+G+R) with y the IMAGE row (top-down) — the
    * moments certify stride and orientation, not just values.
    */
  private[graft] def decodeFrameStats(
      data: Array[Byte], width: Int, height: Int): Option[(Long, Long, Long)] = {
    val st = stride(width)
    if (data.length < st * height) return None
    var s = 0L
    var xm = 0L
    var ym = 0L
    var y = 0
    while (y < height) {
      val rowOff = (height - 1 - y) * st
      var x = 0
      while (x < width) {
        val v = (data(rowOff + x * 3) & 0xFF) + (data(rowOff + x * 3 + 1) & 0xFF) +
          (data(rowOff + x * 3 + 2) & 0xFF)
        s += v
        xm += (x + 1).toLong * v
        ym += (y + 1).toLong * v
        x += 1
      }
      y += 1
    }
    Some((s, xm, ym))
  }

  /** Decode one MJPG frame (a standalone baseline JPEG) via the JDK
    * reader into the same exact-integer stats as [[decodeFrameStats]]:
    * pxSum = Σ(B+G+R), xMoment = Σ(x+1)(B+G+R), yMoment = Σ(y+1)(B+G+R),
    * y top-down (BufferedImage orientation — no bottom-up flip here; the
    * flip is a DIB storage artifact, not a JPEG one). None when the bytes
    * don't decode or the decoded dimensions contradict the container
    * header (fail-loud, the synthMp4 discipline). Decoded values are
    * deterministic for a given JDK — the oracle pins them per fixture
    * class (JPEG is lossy, so a formula replay is impossible by design).
    */
  private[graft] def decodeMjpegFrameStats(
      data: Array[Byte], width: Int, height: Int): Option[(Long, Long, Long)] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(data))
      // NonFatal only: an OOM/StackOverflow inside a hostile decode must
      // propagate, not masquerade as "frame contributes nothing"
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null || img.getWidth != width || img.getHeight != height) return None
    var s = 0L
    var xm = 0L
    var ym = 0L
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val rgb = img.getRGB(x, y)
        val v = ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
        s += v
        xm += (x + 1).toLong * v
        ym += (y + 1).toLong * v
        x += 1
      }
      y += 1
    }
    Some((s, xm, ym))
  }

  /** dHash per decoded frame — REAL pixel-space perceptual hash over the
    * decoded grid (where [[Multimodal.phash]]'s video rows could only
    * byte-fold): nearest-neighbor resample to a 9×8 gray grid
    * (srcX = x·w DIV 9, srcY = y·h DIV 8, gray = (B+G+R) DIV 3), 64
    * difference bits (gray(x+1,y) > gray(x,y)), packed into 4×16-bit
    * bands — the [[Multimodal.phash]] band shape, so decoded video
    * frames join the same near-dup banding join as images. All-integer
    * arithmetic ⇒ formula-replayable cross-engine.
    */
  private[graft] def frameDHash(
      data: Array[Byte], width: Int, height: Int): Option[Array[Long]] = {
    val st = stride(width)
    if (data.length < st * height) return None
    def gray(gx: Int, gy: Int): Long = {
      val sx = gx * width / 9
      val sy = gy * height / 8
      val off = (height - 1 - sy) * st + sx * 3
      ((data(off) & 0xFF) + (data(off + 1) & 0xFF) + (data(off + 2) & 0xFF)).toLong / 3L
    }
    val bands = new Array[Long](4)
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        val idx = gy * 8 + gx
        if (gray(gx + 1, gy) > gray(gx, gy)) bands(idx / 16) |= 1L << (idx % 16)
        gx += 1
      }
      gy += 1
    }
    Some(bands)
  }

  /** [[frameDHash]] over every decodable frame: `(doc_id, frame_idx,
    * band_idx, band_val)` — one row per 16-bit band, ready for the
    * banding equi-join. Zero shuffle.
    */
  def framePhash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        parseAvi(bytes) match {
          case Some((m, frames))
            if m.compression == 0L && m.bitCount == 24 &&
              m.width <= 4096 && m.height <= 4096 =>
            // nearest-neighbor resample handles any positive source size
            // (the 9x8 grid UP-samples the small fixtures; sx < w always)
            frames.iterator.zipWithIndex.flatMap { case (f, i) =>
              frameDHash(f, m.width.toInt, m.height.toInt)
                .map(b => (id, i.toLong, b))
            }
          case _ => Iterator.empty
        }
      })
      .toDF("doc_id", "frame_idx", "bands")
      .select(col("doc_id"), col("frame_idx"),
        posexplode(col("bands")).as(Seq("band_idx", "band_val")))
  }

  /** Structural metadata per AVI row — `(doc_id, ok, handler,
    * micro_sec_pf, n_frames, width, height, bit_count, compression)`,
    * nulls where the bytes aren't a well-formed AVI. Typed mapPartitions
    * (byte decoding — no Catalyst alternative); zero shuffle.
    */
  def aviMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        parseAvi(bytes) match {
          case Some((m, _)) =>
            (id, true, Option(m.handler), Some(m.microSecPerFrame),
              Some(m.totalFrames), Some(m.width), Some(m.height),
              Some(m.bitCount.toLong), Some(m.compression))
          case None =>
            (id, false, Option.empty[String], Option.empty[Long],
              Option.empty[Long], Option.empty[Long], Option.empty[Long],
              Option.empty[Long], Option.empty[Long])
        }
      })
      .toDF("doc_id", "ok", "handler", "micro_sec_pf", "n_frames",
        "width", "height", "bit_count", "compression")
  }

  /** REAL frame decode per AVI row: one output row per decodable frame
    * `(doc_id, frame_idx, px_sum, x_moment, y_moment)`. Dispatches on
    * biCompression — BI_RGB 24-bit DIB grids decode by byte arithmetic,
    * MJPG frames through the JDK's baseline-JPEG reader; corrupt files
    * and other codecs contribute nothing. Zero shuffle; the per-row work
    * is bounded by the file's own byte length.
    */
  def frameStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        parseAvi(bytes) match {
          case Some((m, frames))
            if m.bitCount == 24 && m.width <= 4096 && m.height <= 4096 &&
              (m.compression == 0L || m.compression == MjpgFourcc) =>
            val decode: Array[Byte] => Option[(Long, Long, Long)] =
              if (m.compression == MjpgFourcc)
                decodeMjpegFrameStats(_, m.width.toInt, m.height.toInt)
              else decodeFrameStats(_, m.width.toInt, m.height.toInt)
            frames.iterator.zipWithIndex.flatMap { case (f, i) =>
              decode(f).map { case (s, xm, ym) => (id, i.toLong, s, xm, ym) }
            }
          case _ => Iterator.empty
        }
      })
      .toDF("doc_id", "frame_idx", "px_sum", "x_moment", "y_moment")
  }
}
