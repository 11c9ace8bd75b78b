package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions

/** Native CosineSim ≡ the HOF spelling, bit-for-bit — including the
  * zero-norm, null-element, and length-mismatch edges — on float and
  * double arrays, plus real embeddings.
  */
final class CosineParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bit-identical to the HOF spelling on synthetic edge cases") {
    val rows = Seq(
      (Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),
      (Seq(0.0f, 0.0f), Seq(1.0f, 2.0f)), // zero norm -> 0.0
      (Seq(-1.5f, 2.5f), Seq(-1.5f, 2.5f)), // identical -> ~1.0
      (Seq(1e-30f, 1e30f), Seq(1e30f, 1e-30f)),
      (Seq(0.1f, 0.2f, 0.3f), Seq(0.3f, 0.2f)), // length mismatch -> null
      // r15 ADVICE edge: length mismatch WITH a zero-norm side — the HOF's
      // per-array norms make `when(n === 0, 0)` win over the null-padded
      // dot product, so both spellings must return 0.0, not null
      (Seq(0.0f, 0.0f), Seq(1.0f)),
      (Seq(1.0f), Seq(0.0f, 0.0f))
    ).toDF("a", "b")
    val both = rows.select(
      VectorFunctions.cosine(col("a"), col("b")).as("native"),
      graft.functions.VectorFunctions.cosineHof(col("a"), col("b")).as("hof"))
    both.collect().foreach { r =>
      val n = if (r.isNullAt(0)) None else Some(java.lang.Double.doubleToRawLongBits(r.getDouble(0)))
      val h = if (r.isNullAt(1)) None else Some(java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
      assert(n === h, s"native $n != hof $h")
    }
  }

  test("bit-identical on real embeddings (self-join pairs)") {
    val emb = sources.Tables(spark, TestSpark.Sf0001).embeddings
      .filter(col("vec_id") < 60)
      .select(col("vec_id"), col("embedding"))
    val l = emb.select(col("vec_id").as("id1"), col("embedding").as("v1"))
    val r = emb.select(col("vec_id").as("id2"), col("embedding").as("v2"))
    val pairs = l.crossJoin(r).filter(col("id1") < col("id2"))
    val diff = pairs.select(
      VectorFunctions.cosine(col("v1"), col("v2")).as("native"),
      graft.functions.VectorFunctions.cosineHof(col("v1"), col("v2")).as("hof"))
      .filter(not(col("native") <=> col("hof")))
      .count()
    assert(diff === 0L)
  }

  // r16 ADVICE: the claimed zero-norm + length-mismatch divergence. The
  // matrix below crosses mismatch with zero norms, null elements, NaN, and
  // empties; the bit-parity assertion adjudicates every cell (a null norm
  // nulls the HOF's `n === 0` condition, so BOTH spellings yield null —
  // there is no divergent cell; this spec pins that).
  test("zero-norm x length-mismatch x null/NaN element matrix") {
    val rows = Seq(
      (Seq[java.lang.Double](null, 0.0), Seq[java.lang.Double](0.0)),
      (Seq[java.lang.Double](0.0, 0.0), Seq[java.lang.Double](null)),
      (Seq[java.lang.Double](Double.NaN), Seq[java.lang.Double](0.0, 0.0)),
      (Seq[java.lang.Double](0.0, 0.0), Seq[java.lang.Double](Double.NaN)),
      (Seq.empty[java.lang.Double], Seq[java.lang.Double](1.0, null)),
      (Seq.empty[java.lang.Double], Seq[java.lang.Double](1.0, 2.0)),
      (Seq.empty[java.lang.Double], Seq.empty[java.lang.Double]),
      (Seq[java.lang.Double](null), Seq[java.lang.Double](0.0, 0.0))
    ).toDF("a", "b")
    val both = rows.select(
      VectorFunctions.cosine(col("a"), col("b")).as("native"),
      graft.functions.VectorFunctions.cosineHof(col("a"), col("b")).as("hof"))
    both.collect().foreach { r =>
      val n = if (r.isNullAt(0)) None else Some(java.lang.Double.doubleToRawLongBits(r.getDouble(0)))
      val h = if (r.isNullAt(1)) None else Some(java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
      assert(n === h, s"native $n != hof $h")
    }
  }

  test("double arrays and the null-element edge") {
    val rows = Seq(
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](2.0, 1.0)),
      (Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](2.0, 1.0))
    ).toDF("a", "b")
    val out = rows.select(
      VectorFunctions.cosine(col("a"), col("b")).as("native"),
      graft.functions.VectorFunctions.cosineHof(col("a"), col("b")).as("hof"))
      .collect()
    assert(!out(0).isNullAt(0) && out(0).getDouble(0) === out(0).getDouble(1))
    assert(out(1).isNullAt(0) && out(1).isNullAt(1))
  }
}
