package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** One-pass native BIGINT dot product for `array<bigint>` columns — the
  * integer twin of [[VectorOps]]'s cosine kernel, serving the
  * exact-arithmetic pair paths (quantized-micros dots in
  * [[graft.operators.FacilitySelect]], [[graft.operators.Similarity]]'s
  * windowed-kNN and bucket-verify stages, [[graft.operators.Mmr]]): the
  * HOF spelling `aggregate(zip_with(a, b, _*_), 0L, _+_)` boxes every
  * element twice per pair, profiled as the dominant cost of the
  * facility-selection pair build.
  *
  * Exactness contract (hash-oracle safe — integer arithmetic is
  * order-free, so this is parity by construction, pinned edge-by-edge in
  * LongDotParitySpec):
  *   - null array → null (BinaryExpression null-intolerance, as the HOF).
  *   - length mismatch → null: zip_with pads the shorter side with null,
  *     the padded product is null, and the fold's `acc + null` poisons
  *     the sum.
  *   - null element → null (same padding-poison path).
  *   - both empty → 0 (the fold's seed).
  *   - overflow throws (Math.multiplyExact/addExact), matching the ANSI
  *     Multiply/Add the HOF lambda builds — bounded micro inputs never
  *     reach it, but the failure mode must not silently wrap where the
  *     HOF would raise.
  */
object LongDot {

  /** Boxed so codegen can branch on null; called from both eval paths. */
  def dotKernel(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s = Math.addExact(s, Math.multiplyExact(a.getLong(i), b.getLong(i)))
      i += 1
    }
    s
  }

  def dot_long(a: Column, b: Column): Column =
    ColumnBridge.column(LongDotExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

case class LongDotExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_long_dot"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_long_dot needs array<bigint> on both sides, got $l and $r")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    LongDot.dotKernel(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ca, cb) => {
      val boxed = ctx.freshName("dot")
      s"""
         |java.lang.Long $boxed = graft.expressions.LongDot.dotKernel($ca, $cb);
         |${ev.isNull} = $boxed == null;
         |${ev.value} = ${ev.isNull} ? -1L : $boxed.longValue();
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDotExpr =
    copy(left = newLeft, right = newRight)
}
