package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** [[MinKByAgg]] with a STRING payload: exact bottom-k `(key, id)` pairs
  * per group under lexicographic `(key ASC, id ASC)`, where the id
  * tie-break is UTF8String BINARY order — identical to Spark's
  * `Window.orderBy(key, id)` over a string column, so the heap spelling
  * selects the same membership and ranks as the `row_number` spelling it
  * replaces (and the same order DuckDB's default VARCHAR collation sorts,
  * which is what keeps heap-backed oracles hash-stable).
  *
  * Same economics as [[MinKByAgg]]: map-side combine ships at most k pairs
  * per group per partition — O(n log k) work, O(k·|groups|) shuffle bytes
  * — where window `row_number` co-locates and sorts each FULL group. The
  * shape a per-source top-N vocabulary needs: at a 10⁸-word per-source
  * vocab the window sorts 10⁸ rows per group to keep 100.
  *
  * Returns `array<struct<key: double, id: string>>` sorted ascending.
  */
case class MinKByStrAgg(
    keyChild: Expression,
    idChild: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[java.util.PriorityQueue[(Double, UTF8String)]] {

  require(k > 0 && k <= 65536, "k in 1..65536")

  override def children: Seq[Expression] = Seq(keyChild, idChild)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("key", DoubleType, nullable = false),
      StructField("id", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_min_k_by_str"

  import MinKByStrAgg.{beats, RevOrd}

  override def createAggregationBuffer(): java.util.PriorityQueue[(Double, UTF8String)] =
    new java.util.PriorityQueue[(Double, UTF8String)](k + 1, RevOrd)

  override def update(
      heap: java.util.PriorityQueue[(Double, UTF8String)],
      input: InternalRow
  ): java.util.PriorityQueue[(Double, UTF8String)] = {
    val kv = keyChild.eval(input)
    val iv = idChild.eval(input)
    if (kv != null && iv != null) {
      val kd = kv match {
        case x: java.lang.Number => x.doubleValue()
        case other => other.asInstanceOf[Double]
      }
      // the incoming UTF8String may point into a reused row buffer — only
      // clone when the pair actually enters the heap
      val is = iv.asInstanceOf[UTF8String]
      if (heap.size < k) heap.add((kd, is.clone()))
      else if (beats((kd, is), heap.peek())) {
        heap.poll(); heap.add((kd, is.clone()))
      }
    }
    heap
  }

  override def merge(
      a: java.util.PriorityQueue[(Double, UTF8String)],
      b: java.util.PriorityQueue[(Double, UTF8String)]
  ): java.util.PriorityQueue[(Double, UTF8String)] = {
    val it = b.iterator()
    while (it.hasNext) {
      val pair = it.next()
      if (a.size < k) a.add(pair)
      else if (beats(pair, a.peek())) { a.poll(); a.add(pair) }
    }
    a
  }

  override def eval(heap: java.util.PriorityQueue[(Double, UTF8String)]): Any = {
    val pairs = new Array[(Double, UTF8String)](heap.size)
    var i = 0
    val it = heap.iterator()
    while (it.hasNext) { pairs(i) = it.next(); i += 1 }
    java.util.Arrays.sort(pairs, MinKByStrAgg.FwdOrd)
    val rows = new Array[Any](pairs.length)
    i = 0
    while (i < pairs.length) {
      rows(i) = new GenericInternalRow(Array[Any](pairs(i)._1, pairs(i)._2))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(heap: java.util.PriorityQueue[(Double, UTF8String)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(heap.size)
    val it = heap.iterator()
    while (it.hasNext) {
      val p = it.next()
      out.writeDouble(p._1)
      val bytes = p._2.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[(Double, UTF8String)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val heap = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val key = in.readDouble()
      val len = in.readInt()
      val buf = new Array[Byte](len)
      in.readFully(buf)
      heap.add((key, UTF8String.fromBytes(buf)))
      i += 1
    }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinKByStrAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinKByStrAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MinKByStrAgg =
    copy(keyChild = newChildren(0), idChild = newChildren(1))
}

object MinKByStrAgg {

  /** Lexicographic `(key ASC, id ASC)` — id in UTF8String binary order. */
  private[expressions] object FwdOrd
      extends java.util.Comparator[(Double, UTF8String)] with Serializable {
    def compare(a: (Double, UTF8String), b: (Double, UTF8String)): Int = {
      val c = java.lang.Double.compare(a._1, b._1)
      if (c != 0) c else a._2.compareTo(b._2)
    }
  }

  /** Reversed — max-heap order: head = current worst survivor. */
  private[expressions] object RevOrd
      extends java.util.Comparator[(Double, UTF8String)] with Serializable {
    def compare(a: (Double, UTF8String), b: (Double, UTF8String)): Int =
      FwdOrd.compare(b, a)
  }

  private[expressions] def beats(a: (Double, UTF8String), b: (Double, UTF8String)): Boolean =
    FwdOrd.compare(a, b) < 0

  /** Column API: `min_k_by_str(key, id, k)` aggregate →
    * `array<struct<key double, id string>>` ascending.
    */
  def min_k_by_str(key: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      MinKByStrAgg(ColumnBridge.expression(key), ColumnBridge.expression(id), k)
        .toAggregateExpression())
}
