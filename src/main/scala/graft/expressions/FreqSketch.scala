package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Misra–Gries frequent-items summary as a mergeable
  * `TypedImperativeAggregate`: at most `k` (item → lower-bound count)
  * entries, guaranteeing every item with true frequency > n/(k+1) survives
  * in the summary (Misra & Gries 1982; merge rule per Agarwal et al.,
  * "Mergeable Summaries", PODS 2012 — combine counts, then subtract the
  * (k+1)-th largest and drop non-positives, which preserves the n/(k+1)
  * error bound under arbitrary merge trees).
  *
  * Why an aggregate and not `groupBy(item).count`: the full histogram
  * shuffles one row PER DISTINCT ITEM; the sketch ships O(k) entries per
  * partition regardless of item cardinality — at 100 TB the histogram of a
  * high-cardinality column is itself big data, the sketch never is. The
  * summary's counts are lower bounds (within n/(k+1)), so exact results come
  * from the two-pass spelling in `operators.HeavyHitters`: the summary keys
  * are a superset of the true heavy hitters, and a second pass counts ONLY
  * those candidates exactly.
  *
  * Returns `map<string,bigint>` (candidate → lower-bound count). Nulls are
  * skipped (they are not countable items).
  */
case class FreqSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[java.util.HashMap[String, Long]] {

  require(k > 0 && k <= 4096, "k in 1..4096")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "graft_freq_sketch"

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long](k * 2)

  /** Decrement every counter by `by`, dropping entries that reach ≤ 0. */
  private def decrementAll(m: java.util.HashMap[String, Long], by: Long): Unit = {
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nv = e.getValue - by
      if (nv <= 0L) it.remove() else e.setValue(nv)
    }
  }

  override def update(
      m: java.util.HashMap[String, Long],
      input: InternalRow
  ): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.toString
      val cur = m.get(s)
      if (cur != 0L || m.containsKey(s)) m.put(s, cur + 1L)
      else if (m.size < k) m.put(s, 1L)
      else decrementAll(m, 1L)
    }
    m
  }

  override def merge(
      a: java.util.HashMap[String, Long],
      b: java.util.HashMap[String, Long]
  ): java.util.HashMap[String, Long] = {
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = a.get(e.getKey)
      a.put(e.getKey, cur + e.getValue)
    }
    if (a.size > k) {
      // subtract the (k+1)-th largest count from all, drop non-positives —
      // leaves at most k survivors (ties at the pivot all reach ≤ 0)
      val counts = new Array[Long](a.size)
      var i = 0
      val vs = a.values().iterator()
      while (vs.hasNext) { counts(i) = vs.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val pivot = counts(counts.length - (k + 1)) // (k+1)-th largest
      decrementAll(a, pivot)
    }
    a
  }

  override def eval(m: java.util.HashMap[String, Long]): Any = {
    val n = m.size
    val keys = new Array[Any](n)
    val vals = new Array[Any](n)
    var i = 0
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      keys(i) = UTF8String.fromString(e.getKey)
      vals(i) = e.getValue
      i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  override def serialize(m: java.util.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(m.size)
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      // NOT writeUTF: it caps the encoded key at 65535 bytes and throws
      // UTFDataFormatException past that — sketched items can be long
      // (e.g. whole documents as heavy-hitter keys)
      val kb = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length)
      out.write(kb)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      m.put(new String(kb, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): FreqSketch =
    copy(child = newChildren.head)
}

object FreqSketch {
  /** Column API: `freq_sketch(col, k)` → `map<string,bigint>` candidates. */
  def freq_sketch(c: Column, k: Int): Column =
    ColumnBridge.column(FreqSketch(ColumnBridge.expression(c), k).toAggregateExpression())
}
