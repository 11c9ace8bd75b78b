package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** One-pass native cosine kernel for dense `array<float>`/`array<double>`
  * columns — the pair-join hot path of the similarity/dedup operators.
  *
  * The HOF spelling (`aggregate(zip_with(...))` × 3, kept in
  * [[graft.functions.VectorFunctions]] docs) walks the expression tree
  * with per-element boxing once for the dot product and once per norm —
  * profiled at ~2/3 of q_semantic_dedup_det's wall time, paid per PAIR in
  * every within-cluster self-join. This kernel computes all three
  * accumulators in one primitive loop.
  *
  * Exactness contract (hash-oracle safe): each accumulator is summed in
  * the SAME left-to-right IEEE order the HOF spelling used (acc starts at
  * 0.0; products/squares of the per-element double casts), the norm
  * product is `sqrt(na)*sqrt(nb)`, and the zero-norm branch returns 0.0 —
  * bit-identical to `when(n === 0, 0).otherwise(d / n)`. A null element
  * returns NULL (zip_with's null padding propagates through the fold);
  * a length mismatch returns 0.0 when either per-array norm is zero and
  * NULL otherwise — exactly the HOF branch order (norms are per-array
  * regardless of length, and the zero-norm `when` wins before the
  * null-padded dot product; r15 ADVICE edge, pinned in CosineParitySpec).
  */
object VectorOps {

  /** Element reader tags for the kernel (resolved once at plan time). */
  final val TFloat: Byte = 0
  final val TDouble: Byte = 1
  final val TInt: Byte = 2
  final val TLong: Byte = 3

  private[expressions] def tag(dt: DataType): Byte = dt match {
    case ArrayType(FloatType, _) => TFloat
    case ArrayType(DoubleType, _) => TDouble
    case ArrayType(IntegerType, _) => TInt
    case ArrayType(LongType, _) => TLong
    case other => throw new IllegalArgumentException(
      s"cosine_sim needs array<float|double|int|long>, got $other")
  }

  private def read(a: ArrayData, i: Int, t: Byte): Double = (t: @annotation.switch) match {
    case TFloat => a.getFloat(i).toDouble
    case TDouble => a.getDouble(i)
    case TInt => a.getInt(i).toDouble
    case TLong => a.getLong(i).toDouble
  }

  /** Norm of one array under the HOF fold order; null element → null. */
  private def normSq(a: ArrayData, t: Byte): java.lang.Double = {
    var s = 0.0d
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = read(a, i, t)
      s += x * x
      i += 1
    }
    s
  }

  /** Boxed so codegen can branch on null; called from both eval paths. */
  def cosineKernel(a: ArrayData, b: ArrayData, ta: Byte, tb: Byte): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) {
      // strict HOF parity on the length-mismatch edge (r15 ADVICE): the
      // HOF spelling computes norms PER ARRAY regardless of length, and
      // its `when(n === 0, 0)` branch wins before the (null-padded) dot
      // product — so mismatched lengths return 0.0 when either norm is
      // zero, null otherwise (and null when any element is null, since a
      // null norm fails the `=== 0` test and the otherwise-branch is null)
      val na = normSq(a, ta)
      if (na == null) return null
      val nb = normSq(b, tb)
      if (nb == null) return null
      return if (math.sqrt(na) * math.sqrt(nb) == 0.0d) 0.0d else null
    }
    var d = 0.0d
    var na = 0.0d
    var nb = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = read(a, i, ta)
      val y = read(b, i, tb)
      d += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val nn = math.sqrt(na) * math.sqrt(nb)
    if (nn == 0.0d) 0.0d else d / nn
  }

  def cosine_sim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine_sim"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    try { VectorOps.tag(left.dataType); VectorOps.tag(right.dataType) }
    catch { case e: IllegalArgumentException =>
      return org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(e.getMessage)
    }
    org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val ta: Byte = VectorOps.tag(left.dataType)
  @transient private lazy val tb: Byte = VectorOps.tag(right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.cosineKernel(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], ta, tb)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ca, cb) => {
      val boxed = ctx.freshName("cos")
      s"""
         |java.lang.Double $boxed = graft.expressions.VectorOps.cosineKernel(
         |  $ca, $cb, (byte) $ta, (byte) $tb);
         |${ev.isNull} = $boxed == null;
         |${ev.value} = ${ev.isNull} ? -1.0 : $boxed.doubleValue();
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}
