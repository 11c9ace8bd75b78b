package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Avi

class AviSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def px(f: Int, y: Int, x: Int, c: Int): Int =
    (7 + 31 * f + 7 * y + 3 * x + 11 * c) % 251

  private def fixture(w: Int = 11, h: Int = 6, nf: Int = 3): Array[Byte] =
    Avi.synthAvi(w, h, nf, microSecPerFrame = 40000L, pixel = px)

  test("synth + parse round-trip recovers every metadata field") {
    val bytes = fixture()
    val Some((m, frames)) = Avi.parseAvi(bytes)
    assert(m.handler == "DIB ")
    assert(m.microSecPerFrame == 40000L)
    assert(m.totalFrames == 3L && frames.length == 3)
    assert(m.width == 11L && m.height == 6L)
    assert(m.bitCount == 24 && m.compression == 0L)
    // odd width: stride padded 33 -> 36, so each frame payload carries pad
    assert(Avi.stride(11) == 36)
    assert(frames.forall(_.length == 36 * 6))
  }

  test("decoded frame stats equal the direct pixel-formula computation") {
    val (w, h, nf) = (11, 6, 2)
    val Some((m, frames)) = Avi.parseAvi(fixture(w, h, nf))
    (0 until nf).foreach { f =>
      var s = 0L; var xm = 0L; var ym = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val v = px(f, y, x, 0) + px(f, y, x, 1) + px(f, y, x, 2)
        s += v; xm += (x + 1).toLong * v; ym += (y + 1).toLong * v
      }
      assert(Avi.decodeFrameStats(frames(f), m.width.toInt, m.height.toInt)
        .contains((s, xm, ym)), s"frame $f stats mismatch")
    }
  }

  test("bottom-up orientation actually matters: a top-down misread flips yMoment") {
    // recompute with rows read top-down; assert it DIFFERS from the
    // decoder's answer, so yMoment genuinely certifies orientation
    val Some((m, frames)) = Avi.parseAvi(fixture(11, 6, 1))
    val st = Avi.stride(11)
    var ymTopDown = 0L
    for (y <- 0 until 6; x <- 0 until 11) {
      val off = y * st + x * 3 // WRONG: ignores bottom-up storage
      val v = (frames(0)(off) & 0xFF) + (frames(0)(off + 1) & 0xFF) + (frames(0)(off + 2) & 0xFF)
      ymTopDown += (y + 1).toLong * v
    }
    val Some((_, _, ym)) = Avi.decodeFrameStats(frames(0), 11, 6)
    assert(ym != ymTopDown)
  }

  test("truncation, bad tags, oversized sizes, and random bytes all parse to None") {
    val good = fixture()
    assert(Avi.parseAvi(good.take(20)).isEmpty, "mid-header truncation")
    assert(Avi.parseAvi(good.take(good.length - 7)).isEmpty, "tail truncation")
    val badTag = good.clone(); badTag(8) = 'X'.toByte
    assert(Avi.parseAvi(badTag).isEmpty, "wrong form type")
    val badSize = good.clone(); badSize(4) = (badSize(4) + 64).toByte
    assert(Avi.parseAvi(badSize).isEmpty, "RIFF size beyond buffer")
    assert(Avi.parseAvi(Array.empty[Byte]).isEmpty)
    // seeded fuzz: random blobs and single-byte mutations never throw
    val rng = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val blob = Array.fill(rng.nextInt(200))(rng.nextInt(256).toByte)
      Avi.parseAvi(blob) // must not throw
    }
    (1 to 200).foreach { _ =>
      val mut = good.clone()
      mut(rng.nextInt(mut.length)) = rng.nextInt(256).toByte
      Avi.parseAvi(mut).foreach { case (m, frames) =>
        // surviving parses must still be internally consistent enough to
        // decode without throwing
        if (m.compression == 0L && m.bitCount == 24 &&
          m.width > 0 && m.width <= 4096 && m.height > 0 && m.height <= 4096)
          frames.foreach(f => Avi.decodeFrameStats(f, m.width.toInt, m.height.toInt))
      }
    }
  }

  test("RIFF pad byte honored: an odd-sized JUNK chunk doesn't derail the walk") {
    val good = fixture()
    val junkPayload = Array[Byte](1, 2, 3, 4, 5) // odd size -> 1 pad byte
    val junk = "JUNK".getBytes("ISO-8859-1") ++
      Array[Byte](5, 0, 0, 0) ++ junkPayload ++ Array[Byte](0)
    val spliced = good ++ junk
    // grow the RIFF size by the junk chunk's padded length
    val oldSize = (good(4) & 0xFFL) | ((good(5) & 0xFFL) << 8) |
      ((good(6) & 0xFFL) << 16) | ((good(7) & 0xFFL) << 24)
    val newSize = oldSize + junk.length
    spliced(4) = (newSize & 0xFF).toByte
    spliced(5) = ((newSize >> 8) & 0xFF).toByte
    spliced(6) = ((newSize >> 16) & 0xFF).toByte
    spliced(7) = ((newSize >> 24) & 0xFF).toByte
    val got = Avi.parseAvi(spliced)
    assert(got.nonEmpty, "junk chunk broke the walk")
    assert(got.get._1 == Avi.parseAvi(good).get._1)
    assert(got.get._2.length == 3)
  }

  test("compressed stream: metadata parses, frame decode declines") {
    val bytes = fixture()
    // find the vids strf (BITMAPINFOHEADER) and set biCompression = 1
    val idx = bytes.indexOfSlice("strf".getBytes("ISO-8859-1"))
    assert(idx > 0)
    bytes(idx + 8 + 16) = 1
    val Some((m, _)) = Avi.parseAvi(bytes)
    assert(m.compression == 1L)
    val df = Seq((1L, bytes)).toDF("doc_id", "content")
    assert(Avi.frameStats(df).count() == 0L)
    assert(Avi.aviMeta(df).filter($"ok").count() == 1L)
  }

  test("frameDHash equals a direct formula recompute; uniform frame hashes to 0") {
    val (w, h) = (11, 6)
    val Some((m, frames)) = Avi.parseAvi(fixture(w, h, 1))
    def gray(gx: Int, gy: Int): Long = {
      val sx = gx * w / 9; val sy = gy * h / 8
      (px(0, sy, sx, 0) + px(0, sy, sx, 1) + px(0, sy, sx, 2)).toLong / 3L
    }
    val want = new Array[Long](4)
    for (gy <- 0 until 8; gx <- 0 until 8) {
      val idx = gy * 8 + gx
      if (gray(gx + 1, gy) > gray(gx, gy)) want(idx / 16) |= 1L << (idx % 16)
    }
    assert(Avi.frameDHash(frames(0), m.width.toInt, m.height.toInt)
      .map(_.toSeq).contains(want.toSeq))
    // constant pixels: no strict gradient anywhere -> all four bands 0
    val flat = Avi.synthAvi(11, 6, 1, 40000L, (_, _, _, _) => 77)
    val Some((fm, ff)) = Avi.parseAvi(flat)
    assert(Avi.frameDHash(ff(0), fm.width.toInt, fm.height.toInt)
      .map(_.toSeq).contains(Seq(0L, 0L, 0L, 0L)))
  }

  test("identical frame content in different containers hashes identically (near-dup)") {
    val a = Avi.synthAvi(15, 10, 1, 40000L, px)
    val b = Avi.synthAvi(15, 10, 2, 50000L, px) // extra frame, other timing
    val Some((ma, fa)) = Avi.parseAvi(a)
    val Some((mb, fb)) = Avi.parseAvi(b)
    assert(Avi.frameDHash(fa(0), ma.width.toInt, ma.height.toInt).get.toSeq ==
      Avi.frameDHash(fb(0), mb.width.toInt, mb.height.toInt).get.toSeq)
  }

  test("q_media_avi_frames emits decoded rows on the fixture corpus") {
    val n = SparkEntry.queries("q_media_avi_frames")(spark, TestSpark.Sf0001).count()
    assert(n > 0)
  }

  test("MJPEG: container parses as MJPG, every frame is a real JPEG the JDK decodes") {
    val bytes = Avi.synthMjpegAvi(23, 14, 2, 40000L, 0.9f, px)
    val Some((m, frames)) = Avi.parseAvi(bytes)
    assert(m.handler == "MJPG" && m.compression == Avi.MjpgFourcc)
    assert(m.width == 23 && m.height == 14 && frames.length == 2)
    // JPEG magic on every payload; decode yields stats within the byte range
    for (f <- frames) {
      assert((f(0) & 0xFF) == 0xFF && (f(1) & 0xFF) == 0xD8)
      val Some((s, xm, ym)) = Avi.decodeMjpegFrameStats(f, 23, 14)
      assert(s > 0L && s <= 23L * 14 * 3 * 255)
      assert(xm > 0L && ym > 0L)
    }
    // decode is fail-loud on a container/codec dimension contradiction
    assert(Avi.decodeMjpegFrameStats(frames(0), 24, 14).isEmpty)
    // and declines non-JPEG bytes
    assert(Avi.decodeMjpegFrameStats(Array.fill[Byte](64)(7), 23, 14).isEmpty)
  }

  test("MJPEG decode is deterministic and roughly faithful to the source grid") {
    val bytes = Avi.synthMjpegAvi(23, 14, 1, 40000L, 0.9f, px)
    val Some((m, frames)) = Avi.parseAvi(bytes)
    val a = Avi.decodeMjpegFrameStats(frames(0), 23, 14).get
    val b = Avi.decodeMjpegFrameStats(frames(0), 23, 14).get
    assert(a == b)
    // lossy but bounded: decoded pixel sum within 15% of the exact grid sum
    var exact = 0L
    for (y <- 0 until 14; x <- 0 until 23; c <- 0 until 3) exact += px(0, y, x, c)
    assert(math.abs(a._1 - exact).toDouble / exact < 0.15,
      s"decoded sum ${a._1} too far from source $exact")
  }

  test("MJPEG oracle pins match the RUNNING JDK's decode (codec-change canary)") {
    // The q_media_mjpeg_frames oracle embeds JDK-JPEG-decoder-specific
    // stats as VALUES literals. A JDK/codec upgrade flips all 18 pins and
    // would otherwise surface as an opaque gate hash mismatch that looks
    // like an operator regression (r19 ADVICE). Re-derive the pins on the
    // running JDK and diff them against the oracle literals so the failure
    // self-diagnoses as a codec change with the regeneration command.
    val sql = SparkEntry.oracleSql("q_media_mjpeg_frames")
    val Tuple = """\((\d+),\s*(\d+),\s*(\d+),\s*(\d+),\s*(\d+)\)""".r
    // the 5-int tuples only occur in the pin VALUES list, so scanning the
    // whole SQL text past VALUES is unambiguous
    val pinned = Tuple.findAllMatchIn(sql.substring(sql.indexOf("VALUES")))
      .map(m => (m.group(1).toInt, m.group(2).toInt, m.group(3).toLong,
        m.group(4).toLong, m.group(5).toLong))
      .toSeq
    val live = graft.tools.MjpegOraclePin.pins()
    val jdk = s"${System.getProperty("java.vendor")} ${System.getProperty("java.version")} " +
      s"(runtime ${System.getProperty("java.runtime.version")})"
    assert(pinned.size == live.size && pinned.toSet == live.toSet,
      s"""MJPEG oracle pins do not match this JVM's JPEG decode — this is a
         |JDK/codec CHANGE, not an operator bug. Running JDK: $jdk.
         |Regenerate the pins with `sbt "runMain graft.tools.MjpegOraclePin"`
         |and paste them into OracleEntriesA's q_media_mjpeg_frames VALUES.
         |pinned-not-live: ${(pinned.toSet -- live.toSet).toSeq.sorted.take(5)}
         |live-not-pinned: ${(live.toSet -- pinned.toSet).toSeq.sorted.take(5)}""".stripMargin)
  }

  test("q_media_mjpeg_frames: truncated rows contribute nothing; classes match pins") {
    val df = SparkEntry.queries("q_media_mjpeg_frames")(spark, TestSpark.Sf0001)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // truncated fixture rows ((doc_id/3) % 7 = 1) must yield no frames
    assert(!rows.exists(r => (r.getLong(0) / 3) % 7 == 1))
    // frame count per doc follows the class formula nf = 1 + (m % 12) % 2
    val byDoc = rows.groupBy(_.getLong(0)).map { case (id, rs) => id -> rs.length }
    for ((id, n) <- byDoc) assert(n == 1 + ((id / 3) % 12 % 2).toInt, s"doc $id")
  }
}
