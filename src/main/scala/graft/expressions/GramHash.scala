package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass k-gram md5-32 hasher for [[graft.operators.Winnow]]:
  * every gram hash of a string in a single loop over one reused digest.
  *
  * BIT-IDENTICAL to the HOF spelling it replaces (`transform(sequence(…),
  * p ⇒ conv(substring(md5(s.substr(p, k)), 1, 8), 16, 10))`): gram p's
  * value is the first 4 bytes — big-endian — of MD5(UTF-8 bytes of the
  * k-char substring at 1-based position p). Besides removing the per-gram
  * expression-tree walk (hex encode, string→long conv, array churn), the
  * kernel closes an optimizer hazard: a lambda that slices an upstream
  * ALIAS can see the alias inlined by CollapseProject, re-running the
  * normalize regex once per gram — O(len²) per document. One expression,
  * one evaluation.
  *
  * Strings shorter than k return an empty array (the fingerprint pass
  * filters them anyway).
  */
object GramHash {

  private val mdTl: ThreadLocal[MessageDigest] =
    new ThreadLocal[MessageDigest] {
      override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
    }

  def kernel(s: UTF8String, k: Int): ArrayData = {
    val n = s.numChars()
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n - k + 1)
    val md = mdTl.get()
    var p = 0
    while (p <= n - k) {
      md.reset()
      // substringSQL is the engine's substr: 1-based, char-counted
      md.update(s.substringSQL(p + 1, k).getBytes)
      val d = md.digest()
      out(p) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      p += 1
    }
    new GenericArrayData(out)
  }

  /** All k-gram md5-32 hashes as one array<long> column, gram order. */
  def grams(s: Column, k: Int): Column =
    ColumnBridge.column(GramHashes(ColumnBridge.expression(s), k))
}

case class GramHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "k >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_gram_hashes"

  override def nullSafeEval(input: Any): Any =
    GramHash.kernel(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.expressions.GramHash.kernel($c, $k);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): GramHashes =
    copy(child = newChild)
}
