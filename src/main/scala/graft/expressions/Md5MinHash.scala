package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native one-pass kernel for the portable 16-lane md5-48 MinHash
  * ([[graft.functions.TextFunctions.minhash48Lanes]]): all lane minima in
  * a single traversal of the shingle array, hashing raw digest bytes
  * instead of round-tripping through hex + `conv`.
  *
  * BIT-IDENTICAL to the HOF spelling (and therefore to the DuckDB oracle):
  * lane i's value is min over shingles of the first 6 bytes — big-endian —
  * of MD5("i <shingle>"), which is exactly
  * `conv(substring(md5(concat_ws(' ', i, s)), 1, 12), 16, 10)`. What the
  * kernel removes is the 16× per-shingle expression-tree re-evaluation,
  * the hex-string encode, the string→long parse, and the 16 intermediate
  * array allocations per row — the r15 TimeQ profile had the HOF spelling
  * as the bench's slowest query (6.3 s at sf0.1).
  *
  * Empty shingle input returns null, matching `array_min` over an empty
  * transform (shingles3 guarantees ≥ 1 shingle, so this is belt-and-
  * braces).
  */
object Md5MinHash {

  private val mdTl: ThreadLocal[MessageDigest] =
    new ThreadLocal[MessageDigest] {
      override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
    }

  def kernel(arr: ArrayData, salts: Array[Array[Byte]]): ArrayData = {
    val n = salts.length
    val m = arr.numElements()
    if (m == 0) return null
    val mins = Array.fill(n)(Long.MaxValue)
    var j = 0
    while (j < m) {
      val sb = arr.getUTF8String(j).getBytes
      var i = 0
      while (i < n) {
        val md = mdTl.get()
        md.reset()
        md.update(salts(i))
        md.update(sb)
        val d = md.digest()
        val v = ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) |
          ((d(2) & 0xffL) << 24) | ((d(3) & 0xffL) << 16) |
          ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  /** All `nLanes` lane minima as one array<long> column. */
  def lanes(shingles: Column, nLanes: Int = 16): Column =
    ColumnBridge.column(MinHash48Lanes(ColumnBridge.expression(shingles), nLanes))
}

case class MinHash48Lanes(child: Expression, nLanes: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash48"

  @transient private lazy val salts: Array[Array[Byte]] =
    Array.tabulate(nLanes)(i => (i.toString + " ").getBytes("UTF-8"))

  override def nullSafeEval(input: Any): Any =
    Md5MinHash.kernel(input.asInstanceOf[ArrayData], salts)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val saltsRef = ctx.addReferenceObj("mhSalts", salts, "byte[][]")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.expressions.Md5MinHash.kernel($c, $saltsRef);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHash48Lanes =
    copy(child = newChild)
}
