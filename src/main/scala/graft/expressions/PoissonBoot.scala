package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass kernel for the Poisson-bootstrap replicate weights
  * ([[graft.operators.Bootstrap]]): all B draws for a row in a single
  * loop over raw digest bytes.
  *
  * BIT-IDENTICAL to the column spelling it replaces: draw b is
  * u = md5-48(id ‖ ':' ‖ b) / 2⁴⁸ (first 6 digest bytes big-endian, exactly
  * `conv(substring(md5(concat(id, ':', b)), 1, 12), 16, 10)`), and the
  * weight is the count of CDF thresholds with u ≥ P(X ≤ k) — the same
  * doubles, compared the same way, so every bootstrap oracle hash is
  * unchanged. What the kernel removes is the B× explode-then-expression-
  * tree evaluation per row: the concat allocation, hex encode, string→long
  * conv, and 8 `when` nodes per (row, replicate) — the Md5MinHash move
  * applied to the bootstrap family (4 of the bench's slower queries).
  *
  * The id must be non-null (bootstrap callers draw on primary keys); a
  * null id nulls the whole array and posexplode drops the row.
  */
object PoissonBoot {

  private val mdTl: ThreadLocal[MessageDigest] =
    new ThreadLocal[MessageDigest] {
      override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
    }

  def kernel(id: UTF8String, suffixes: Array[Array[Byte]], cdf: Array[Double]): ArrayData = {
    val n = suffixes.length
    val idb = id.getBytes
    val out = new Array[Long](n)
    var b = 0
    while (b < n) {
      val md = mdTl.get()
      md.reset()
      md.update(idb)
      md.update(suffixes(b))
      val d = md.digest()
      val v = ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) |
        ((d(2) & 0xffL) << 24) | ((d(3) & 0xffL) << 16) |
        ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
      val u = v.toDouble / 281474976710656.0d
      var w = 0L
      var k = 0
      while (k < cdf.length) {
        if (u >= cdf(k)) w += 1L
        k += 1
      }
      out(b) = w
      b += 1
    }
    new GenericArrayData(out)
  }

  /** All B replicate weights as one array<long> column; pair with
    * `posexplode` for the (b, w) long format the aggregates consume.
    */
  def weights(id: Column, b: Int): Column =
    ColumnBridge.column(PoissonWeights(ColumnBridge.expression(id.cast("string")), b))
}

case class PoissonWeights(child: Expression, b: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_poisson_weights"

  @transient private lazy val suffixes: Array[Array[Byte]] =
    Array.tabulate(b)(i => (":" + i.toString).getBytes("UTF-8"))

  @transient private lazy val cdf: Array[Double] =
    graft.operators.Bootstrap.PoissonCdf.toArray

  override def nullSafeEval(input: Any): Any =
    PoissonBoot.kernel(input.asInstanceOf[UTF8String], suffixes, cdf)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sufRef = ctx.addReferenceObj("pbSuffixes", suffixes, "byte[][]")
    val cdfRef = ctx.addReferenceObj("pbCdf", cdf, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.expressions.PoissonBoot.kernel($c, $sufRef, $cdfRef);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PoissonWeights =
    copy(child = newChild)
}
