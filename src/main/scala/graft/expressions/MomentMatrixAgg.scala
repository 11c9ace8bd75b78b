package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** One-pass second-moment accumulator over a vector column: emits
  * `[n, s_0..s_{d-1}, q_00, q_01, .., q_{d-1 d-1}]` — row count, per-dim
  * sums Σxᵢ, and the full (symmetric, row-major) raw second-moment matrix
  * Σxᵢxⱼ — everything a covariance/correlation matrix or a PCA needs,
  * from ONE scan with an O(d²) fixed-size buffer.
  *
  * Why an aggregate and not an (i, j) explode? The explode spelling
  * multiplies the fact table by d² rows before aggregating (×4096 at
  * d = 64) — unusable at 100 TB. This buffer ships 1 + d + d² doubles per
  * partition through the shuffle regardless of row count, and merges are
  * elementwise adds (fully mergeable, map-side combining).
  *
  * Rows whose vector is null or shorter than `d` are skipped (counted
  * nowhere) — callers see the honest n. Values are promoted float→double
  * exactly; the accumulation order is partition-dependent as with any
  * float sum, so oracled consumers round the emitted stats (the round-6
  * sufficient-statistics discipline) before deriving anything.
  */
case class MomentMatrixAgg(
    child: Expression,
    d: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Double]] {

  require(d > 0 && d <= 128, "d in 1..128")

  private val bufLen = 1 + d + d * d

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_moment_matrix"

  override def createAggregationBuffer(): Array[Double] = new Array[Double](bufLen)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() >= d) {
        val x = new Array[Double](d)
        val elemType = child.dataType.asInstanceOf[ArrayType].elementType
        var i = 0
        while (i < d) {
          x(i) = elemType match {
            case FloatType  => arr.getFloat(i).toDouble
            case DoubleType => arr.getDouble(i)
            case _          => arr.get(i, elemType).asInstanceOf[Number].doubleValue()
          }
          i += 1
        }
        buf(0) += 1.0
        i = 0
        while (i < d) {
          buf(1 + i) += x(i)
          var j = 0
          val base = 1 + d + i * d
          while (j < d) { buf(base + j) += x(i) * x(j); j += 1 }
          i += 1
        }
      }
    }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < bufLen) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Double]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(bufLen * 8)
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < bufLen) { out.writeDouble(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Double](bufLen)
    var i = 0
    while (i < bufLen) { buf(i) = in.readDouble(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MomentMatrixAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MomentMatrixAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MomentMatrixAgg =
    copy(child = newChildren.head)
}

object MomentMatrixAgg {
  /** Column API: one-pass `[n, s.., q..]` moment stats of `c`'s first d dims. */
  def moment_matrix(c: Column, d: Int): Column =
    ColumnBridge.column(
      MomentMatrixAgg(ColumnBridge.expression(c), d).toAggregateExpression())
}
