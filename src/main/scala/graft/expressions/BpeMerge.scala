package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One BPE merge step applied to a symbol array: greedy left-to-right
  * replacement of every adjacent (a, b) with the concatenation ab —
  * overlapping candidates resolve leftmost-first ("a a a" under (a,a) →
  * ["aa", "a"]), the contract every BPE implementation shares (Sennrich
  * 2016, learn_bpe).
  *
  * A native kernel because the column-function spelling would be a
  * sequential fold with lookahead — `transform` can't consume two elements,
  * and an `aggregate` lambda re-boxes the accumulator array per element.
  * Codegen calls the static kernel, so N merge steps stay N tight loops
  * inside one WholeStageCodegen span.
  */
object BpeMerge {

  /** Static kernel targeted by generated code (and nullSafeEval). */
  def mergePairKernel(
      arr: ArrayData,
      a: UTF8String,
      b: UTF8String,
      merged: UTF8String
  ): ArrayData = {
    val n = arr.numElements()
    val out = new Array[AnyRef](n)
    var o = 0
    var i = 0
    while (i < n) {
      if (i < n - 1 && arr.getUTF8String(i).equals(a) && arr.getUTF8String(i + 1).equals(b)) {
        out(o) = merged
        i += 2
      } else {
        out(o) = arr.getUTF8String(i)
        i += 1
      }
      o += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, o).asInstanceOf[Array[Any]])
  }

  /** Column API: apply the merge (a, b) → ab to an `array<string>` column. */
  def mergePair(syms: Column, a: String, b: String): Column =
    ColumnBridge.column(PairMerge(ColumnBridge.expression(syms), a, b))

  /** Static kernel: apply a whole merge table in rank order — the BPE
    * ENCODE path (tokenize new text under learned merges). Flat layout
    * [a0, b0, ab0, a1, b1, ab1, …].
    */
  def applyMergesKernel(arr: ArrayData, flat: Array[UTF8String]): ArrayData = {
    var cur = arr
    var k = 0
    while (k < flat.length) {
      cur = mergePairKernel(cur, flat(k), flat(k + 1), flat(k + 2))
      k += 3
    }
    if (cur eq arr) {
      // no merges: return a fresh ArrayData WRAPPER so the caller never
      // holds the input row's own ArrayData. NOTE the UTF8String elements
      // still alias the input row's byte buffer — consumers must copy via
      // an UnsafeProjection before buffering (all current usages are plain
      // projections, which do).
      val n = arr.numElements()
      val out = new Array[AnyRef](n)
      var i = 0
      while (i < n) { out(i) = arr.getUTF8String(i); i += 1 }
      new GenericArrayData(out.asInstanceOf[Array[Any]])
    } else cur
  }

  /** Column API: apply `merges` in learned order to an `array<string>`
    * column (one tight pass per merge, all inside one codegen'd call).
    */
  def applyMerges(syms: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(ApplyMerges(ColumnBridge.expression(syms), merges))
}

case class PairMerge(child: Expression, a: String, b: String) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_merge_pair"

  @transient private lazy val aU8 = UTF8String.fromString(a)
  @transient private lazy val bU8 = UTF8String.fromString(b)
  @transient private lazy val mergedU8 = UTF8String.fromString(a + b)

  override def nullSafeEval(input: Any): Any =
    BpeMerge.mergePairKernel(input.asInstanceOf[ArrayData], aU8, bU8, mergedU8)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val u8 = "org.apache.spark.unsafe.types.UTF8String"
    val aRef = ctx.addReferenceObj("bpeA", aU8, u8)
    val bRef = ctx.addReferenceObj("bpeB", bU8, u8)
    val mRef = ctx.addReferenceObj("bpeM", mergedU8, u8)
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.BpeMerge.mergePairKernel($c, $aRef, $bRef, $mRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): PairMerge =
    copy(child = newChild)
}

case class ApplyMerges(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_apply"

  @transient private lazy val flat: Array[UTF8String] =
    merges.flatMap { case (a, b) =>
      Seq(UTF8String.fromString(a), UTF8String.fromString(b), UTF8String.fromString(a + b))
    }.toArray

  override def nullSafeEval(input: Any): Any =
    BpeMerge.applyMergesKernel(input.asInstanceOf[ArrayData], flat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("bpeFlat", flat,
      "org.apache.spark.unsafe.types.UTF8String[]")
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.BpeMerge.applyMergesKernel($c, $flatRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): ApplyMerges =
    copy(child = newChild)
}
