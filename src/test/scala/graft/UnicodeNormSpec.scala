package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.UnicodeNorm

/** NFC kernel units: canonical composition, already-normalized fast path
  * (same reference back), compatibility characters untouched, and the
  * codegen'd projection end to end.
  */
final class UnicodeNormSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("kernel composes canonical sequences and leaves NFC alone") {
    val dec = UTF8String.fromString("café Ångström")
    assert(UnicodeNorm.nfcKernel(dec).toString === "caf\u00E9 \u00C5ngstr\u00F6m")
    val ascii = UTF8String.fromString("plain ascii")
    // fast path: the very same object, zero allocation
    assert(UnicodeNorm.nfcKernel(ascii) eq ascii)
    // NFC is not NFKC: the fi ligature is compatibility-only, unchanged
    val lig = UTF8String.fromString("ﬁle")
    assert(UnicodeNorm.nfcKernel(lig).toString === "ﬁle")
  }

  test("projection: normalized equality across spellings, null-safe") {
    val df = Seq(
      (1L, "café"), (2L, "café"), (3L, null.asInstanceOf[String]))
      .toDF("id", "t")
      .select($"id", UnicodeNorm.nfc($"t").as("n"), length(UnicodeNorm.nfc($"t")).as("l"))
    val rows = df.collect().map(r => (r.getLong(0),
      Option(r.getString(1)), if (r.isNullAt(2)) -1 else r.getInt(2))).toSet
    assert(rows === Set(
      (1L, Some("caf\u00E9"), 4), (2L, Some("caf\u00E9"), 4), (3L, None, -1)))
    // the two spellings hash identically AFTER normalization
    val hashes = Seq("café", "café").toDF("t")
      .select(md5(UnicodeNorm.nfc($"t"))).as[String].collect()
    assert(hashes.distinct.length === 1)
  }
}
