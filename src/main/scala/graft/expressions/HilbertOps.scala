package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native one-loop Hilbert-index kernel — the codegen'd replacement for
  * [[graft.operators.Hilbert]]'s unrolled per-bit-level projection chain.
  *
  * The unrolled Column spelling (kept as `Hilbert.withKeyUnrolled` for the
  * parity spec and as the shape the DuckDB oracle replays) is correct and
  * zero-shuffle, but materializes 3 named state columns × `bits` levels —
  * a ~50-projection Catalyst plan whose analysis/codegen overhead showed
  * up as q_hilbert_key's 5.1 s median at sf0.1 (r15 plan audit). This
  * kernel runs the classic xy2d rotate-and-flip loop (Wikipedia spelling;
  * the HilbertSpec reference) in one tight Java loop per row — identical
  * values (pure integer arithmetic, no float anywhere), one expression
  * node, whole-stage-codegen friendly. The [[CosineSim]]/[[RepCoverage]]
  * precedent.
  *
  * Exactness contract: inputs clamp via `Math.floorMod(v, 2^bits)` ≡ Spark
  * `pmod` ≡ the unrolled spelling's clamp; per level (MSB→LSB)
  * d += ((3·rx)^ry)·4^k with the ry==0 swap/point-reflection rotation —
  * bit-identical to both the unrolled chain and the classic xy2d.
  */
object HilbertOps {

  /** xy2d on the 2^bits grid; called from interpreted and codegen paths. */
  def hilbertKernel(x0: Long, y0: Long, bits: Int): Long = {
    val n = 1L << bits
    var x = java.lang.Math.floorMod(x0, n)
    var y = java.lang.Math.floorMod(y0, n)
    var d = 0L
    var k = bits - 1
    while (k >= 0) {
      val rx = (x >> k) & 1L
      val ry = (y >> k) & 1L
      d += ((3L * rx) ^ ry) << (2 * k)
      if (ry == 0L) {
        if (rx == 1L) { val t = n - 1L - y; y = n - 1L - x; x = t }
        else { val t = x; x = y; y = t }
      }
      k -= 1
    }
    d
  }

  def hilbert_key(x: Column, y: Column, bits: Int): Column =
    ColumnBridge.column(HilbertKey(
      ColumnBridge.expression(x.cast("long")),
      ColumnBridge.expression(y.cast("long")), bits))
}

case class HilbertKey(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"bits $bits must be in [1, 31]")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert_key"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"hilbert_key needs (bigint, bigint), got (${left.dataType}, ${right.dataType})")

  override def nullSafeEval(x: Any, y: Any): Any =
    HilbertOps.hilbertKernel(x.asInstanceOf[Long], y.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (cx, cy) =>
      s"graft.expressions.HilbertOps.hilbertKernel($cx, $cy, $bits)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertKey =
    copy(left = newLeft, right = newRight)
}
