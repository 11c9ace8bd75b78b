package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Hilbert

class HilbertSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // classic xy2d (Wikipedia spelling) — the independent reference
  private def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    val n = 1L << bits
    var (x, y, d) = (x0, y0, 0L)
    var s = n / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  test("matches the classic xy2d on random 16-bit coordinates") {
    val r = new scala.util.Random(4242)
    val pts = (1 to 500).map(i =>
      (i.toLong, r.nextInt(65536).toLong, r.nextInt(65536).toLong))
    val got = Hilbert
      .withKey(pts.toDF("id", "x", "y"), "x", "y", "hkey", bits = 16)
      .select("id", "x", "y", "hkey").as[(Long, Long, Long, Long)].collect()
    got.foreach { case (id, x, y, h) =>
      assert(h == xy2d(16, x, y), s"id $id ($x,$y): got $h want ${xy2d(16, x, y)}")
    }
  }

  test("bijective on the full 32x32 grid and unit-step continuous") {
    val pts = for (x <- 0 until 32; y <- 0 until 32) yield (x.toLong, y.toLong)
    val got = Hilbert
      .withKey(pts.toDF("x", "y"), "x", "y", "hkey", bits = 5)
      .as[(Long, Long, Long)].collect()
    assert(got.map(_._3).toSet == (0L until 1024L).toSet, "not a bijection")
    // the Hilbert property Morton lacks: consecutive indices are ALWAYS
    // one grid step apart (|dx| + |dy| == 1)
    val byD = got.sortBy(_._3)
    byD.sliding(2).foreach { case Array((x1, y1, _), (x2, y2, _)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump between ($x1,$y1) and ($x2,$y2)")
    }
  }

  test("inputs clamp via pmod like zkey2") {
    val got = Hilbert
      .withKey(Seq((70000L, -3L)).toDF("x", "y"), "x", "y", "hkey", bits = 16)
      .select("hkey").as[Long].head()
    assert(got == xy2d(16, 70000L % 65536, ((-3L % 65536) + 65536) % 65536))
  }

  test("native kernel ≡ unrolled Column spelling (incl. clamped inputs and nulls)") {
    val r = new scala.util.Random(77)
    val pts = (1 to 300).map(i =>
      (i.toLong, r.nextLong() % 200000L, r.nextLong() % 200000L))
    val df = pts.toDF("id", "x", "y")
    for (bits <- Seq(4, 16)) {
      val native = Hilbert.withKey(df, "x", "y", "hkey", bits)
        .select("id", "hkey").as[(Long, Long)].collect().toMap
      val unrolled = Hilbert.withKeyUnrolled(df, "x", "y", "hkey", bits)
        .select("id", "hkey").as[(Long, Long)].collect().toMap
      assert(native == unrolled, s"bits=$bits")
    }
    // null inputs propagate as null in both spellings
    val withNull = Seq((1L, Some(5L), Option.empty[Long])).toDF("id", "x", "y")
    val nNative = Hilbert.withKey(withNull, "x", "y", "hkey", 8)
      .select("hkey").collect().head
    val nUnrolled = Hilbert.withKeyUnrolled(withNull, "x", "y", "hkey", 8)
      .select("hkey").collect().head
    assert(nNative.isNullAt(0) == nUnrolled.isNullAt(0))
  }
}
