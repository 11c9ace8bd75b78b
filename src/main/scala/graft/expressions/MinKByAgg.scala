package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Exact bottom-k `(key, id)` pairs per group — [[TopKAgg]]'s shape, but
  * keeping the SMALLEST k keys and carrying a long payload, which is what a
  * deterministic sampling draw needs (the winners' ids, not just their
  * keys). Ordering is lexicographic `(key ASC, id ASC)` — exactly the
  * `Window.orderBy(key, id)` order of the window spelling, so both paths
  * select the identical membership.
  *
  * As a `TypedImperativeAggregate` it combines map-side: each partition
  * ships at most k pairs per group through the shuffle regardless of group
  * size — O(n log k) work, O(k) shuffle bytes per group — where window
  * `row_number` must co-locate and sort the FULL group on one partition
  * (the hot-group hazard GroupCap documents). At 100 TB group sizes this is
  * the difference between shuffling the corpus and shuffling k·|groups|
  * pairs.
  *
  * Returns `array<struct<key: double, id: long>>` sorted ascending.
  */
case class MinKByAgg(
    keyChild: Expression,
    idChild: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[java.util.PriorityQueue[(Double, Long)]] {

  require(k > 0 && k <= 65536, "k in 1..65536")

  override def children: Seq[Expression] = Seq(keyChild, idChild)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("key", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_min_k_by"

  import MinKByAgg.{beats, RevOrd}

  override def createAggregationBuffer(): java.util.PriorityQueue[(Double, Long)] =
    new java.util.PriorityQueue[(Double, Long)](k + 1, RevOrd)

  override def update(
      heap: java.util.PriorityQueue[(Double, Long)],
      input: InternalRow
  ): java.util.PriorityQueue[(Double, Long)] = {
    val kv = keyChild.eval(input)
    val iv = idChild.eval(input)
    if (kv != null && iv != null) {
      // tolerant numeric conversion like TopKAgg — the SQL registration
      // (graft_min_k_by) has no coercion, so INT/FLOAT args must not CCE
      val kd = kv match {
        case x: java.lang.Number => x.doubleValue()
        case other => other.asInstanceOf[Double]
      }
      val il = iv match {
        case x: java.lang.Number => x.longValue()
        case other => other.asInstanceOf[Long]
      }
      val pair = (kd, il)
      if (heap.size < k) heap.add(pair)
      else if (beats(pair, heap.peek())) { heap.poll(); heap.add(pair) }
    }
    heap
  }

  override def merge(
      a: java.util.PriorityQueue[(Double, Long)],
      b: java.util.PriorityQueue[(Double, Long)]
  ): java.util.PriorityQueue[(Double, Long)] = {
    val it = b.iterator()
    while (it.hasNext) {
      val pair = it.next()
      if (a.size < k) a.add(pair)
      else if (beats(pair, a.peek())) { a.poll(); a.add(pair) }
    }
    a
  }

  override def eval(heap: java.util.PriorityQueue[(Double, Long)]): Any = {
    val pairs = new Array[(Double, Long)](heap.size)
    var i = 0
    val it = heap.iterator()
    while (it.hasNext) { pairs(i) = it.next(); i += 1 }
    java.util.Arrays.sort(pairs, MinKByAgg.FwdOrd)
    val rows = new Array[Any](pairs.length)
    i = 0
    while (i < pairs.length) {
      rows(i) = new GenericInternalRow(Array[Any](pairs(i)._1, pairs(i)._2))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(heap: java.util.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(heap.size)
    val it = heap.iterator()
    while (it.hasNext) {
      val p = it.next()
      out.writeDouble(p._1)
      out.writeLong(p._2)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val heap = createAggregationBuffer()
    var i = 0
    while (i < n) { heap.add((in.readDouble(), in.readLong())); i += 1 }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinKByAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinKByAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MinKByAgg =
    copy(keyChild = newChildren(0), idChild = newChildren(1))
}

object MinKByAgg {

  /** Lexicographic `(key ASC, id ASC)`. */
  private[expressions] object FwdOrd
      extends java.util.Comparator[(Double, Long)] with Serializable {
    def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(a._1, b._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  /** Reversed — max-heap order: head = current worst survivor (the
    * eviction candidate).
    */
  private[expressions] object RevOrd
      extends java.util.Comparator[(Double, Long)] with Serializable {
    def compare(a: (Double, Long), b: (Double, Long)): Int = FwdOrd.compare(b, a)
  }

  private[expressions] def beats(a: (Double, Long), b: (Double, Long)): Boolean =
    FwdOrd.compare(a, b) < 0

  /** Column API: `min_k_by(key, id, k)` aggregate →
    * `array<struct<key double, id long>>` ascending.
    */
  def min_k_by(key: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      MinKByAgg(ColumnBridge.expression(key), ColumnBridge.expression(id), k)
        .toAggregateExpression())
}
