package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi segmentation of a word under a unigram-LM piece table (Kudo
  * 2018, SentencePiece): the segmentation maximizing the sum of piece
  * scores, via the standard O(len·maxPiece) DP. Total order everywhere:
  * at each end position the argmax candidate breaks ties on the SMALLEST
  * start (= the longest last piece), so the chosen path is unique and
  * replayable cross-engine (the unrolled-CTE oracle re-derives the same
  * path from the forward scores by repeated argmax with the same
  * tie-break).
  *
  * A native kernel because the DP is a sequential loop with backpointers
  * — inexpressible in the HOF column functions without re-boxing the
  * state array per element. Codegen calls the static kernel, so the whole
  * E-step stays one zero-shuffle projection inside WholeStageCodegen.
  *
  * Scores are integer micros (the [[graft.operators.UnigramLm]] ln-replay
  * discipline), so every path sum is exact BIGINT arithmetic. A word the
  * table cannot cover returns an EMPTY array (never happens when the
  * table contains every character of the input, which the trainer
  * guarantees).
  */
object UnigramSegment {

  /** Static kernel targeted by generated code (and nullSafeEval). */
  def segmentKernel(
      word: UTF8String,
      table: java.util.HashMap[String, java.lang.Long],
      maxPiece: Int
  ): ArrayData = {
    val s = word.toString
    val m = s.length
    if (m == 0) return new GenericArrayData(Array.empty[Any])
    val b = new Array[Long](m + 1)
    val back = new Array[Int](m + 1)
    val reach = new Array[Boolean](m + 1)
    reach(0) = true
    var i = 1
    while (i <= m) {
      var best = Long.MinValue
      var bestJ = -1
      // L descending = start j ascending: the first strict max keeps the
      // smallest j among ties — the documented canonical-path rule
      var L = math.min(maxPiece, i)
      while (L >= 1) {
        val j = i - L
        if (reach(j)) {
          val sc = table.get(s.substring(j, i))
          if (sc != null) {
            val v = b(j) + sc.longValue()
            if (v > best) { best = v; bestJ = j }
          }
        }
        L -= 1
      }
      if (bestJ >= 0) { b(i) = best; back(i) = bestJ; reach(i) = true }
      i += 1
    }
    if (!reach(m)) return new GenericArrayData(Array.empty[Any])
    var nPieces = 0
    var p = m
    while (p > 0) { p = back(p); nPieces += 1 }
    val out = new Array[Any](nPieces)
    p = m
    var o = nPieces - 1
    while (p > 0) {
      val j = back(p)
      out(o) = UTF8String.fromString(s.substring(j, p))
      p = j
      o -= 1
    }
    new GenericArrayData(out)
  }

  /** Column API: best segmentation of `word` under the integer-micros
    * piece scores (ships as one broadcast-as-literal table).
    */
  def segment(word: Column, scores: Map[String, Long], maxPiece: Int): Column =
    ColumnBridge.column(
      UnigramSegmentExpr(ColumnBridge.expression(word), scores.toSeq.sorted, maxPiece))
}

case class UnigramSegmentExpr(
    child: Expression,
    scores: Seq[(String, Long)],
    maxPiece: Int
) extends UnaryExpression {

  require(maxPiece >= 1, "maxPiece >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_unigram_segment"

  @transient private lazy val table: java.util.HashMap[String, java.lang.Long] = {
    val t = new java.util.HashMap[String, java.lang.Long](scores.size * 2)
    scores.foreach { case (p, s) => t.put(p, java.lang.Long.valueOf(s)) }
    t
  }

  override def nullSafeEval(input: Any): Any =
    UnigramSegment.segmentKernel(input.asInstanceOf[UTF8String], table, maxPiece)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("unigramTable", table, "java.util.HashMap")
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.UnigramSegment.segmentKernel($c, $tableRef, $maxPiece)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramSegmentExpr =
    copy(child = newChild)
}
