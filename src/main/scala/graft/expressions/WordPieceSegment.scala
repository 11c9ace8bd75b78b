package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece greedy segmentation (Devlin et al. 2018, BERT): at each
  * position take the LONGEST vocab piece that matches — word-initial
  * pieces match verbatim, continuation pieces carry the `##` prefix —
  * and emit `[UNK]` for the whole word when no piece matches at some
  * position. This is the longest-match-first ("MaxMatch") algorithm; the
  * bounded-piece scan below is the practical linear-time shape (Song et
  * al. 2021 reach O(n) with a trie — with pieces capped at `maxPiece`
  * chars the plain scan is already O(n·maxPiece)).
  *
  * A native kernel for the same reason as [[UnigramSegment]]: the
  * position loop with early termination is inexpressible in HOF column
  * functions without re-boxing state per element, and the static-kernel
  * call keeps the whole encode one zero-shuffle projection inside
  * WholeStageCodegen. The vocab ships as one broadcast-as-literal hash
  * set (bounded: topV multi-char pieces + the single-char alphabet).
  *
  * Greedy choice is deterministic (longest L wins; pieces are unique
  * strings), so the segmentation replays cross-engine — the DuckDB
  * oracle unrolls the position loop as layered argmax-by-length CTEs.
  */
object WordPieceSegment {

  val Unk = "[UNK]"

  /** Static kernel targeted by generated code (and nullSafeEval).
    *
    * ASCII-only contract: positions index UTF-16 code units
    * (String.substring), so a supplementary-plane character would split
    * into lone surrogates — and the DuckDB oracle's substr is
    * CHARACTER-based, so any non-ASCII vocab entry would diverge between
    * engines. Safe as shipped because the population predicate
    * (WordPiece.isWordPieceWord) restricts words to printable ASCII;
    * callers outside that predicate must enforce the same restriction
    * (or map words containing surrogates to [UNK]) before using this
    * kernel in an oracled path.
    */
  def segmentKernel(
      word: UTF8String,
      vocab: java.util.HashSet[String],
      maxPiece: Int
  ): ArrayData = {
    val s = word.toString
    val m = s.length
    if (m == 0) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[Any](m)
    var pos = 0
    while (pos < m) {
      var L = math.min(maxPiece, m - pos)
      var found = 0
      var fp: String = null
      while (L >= 1 && found == 0) {
        val cand =
          if (pos == 0) s.substring(0, L)
          else "##" + s.substring(pos, pos + L)
        if (vocab.contains(cand)) { found = L; fp = cand }
        L -= 1
      }
      if (found == 0)
        return new GenericArrayData(Array[Any](UTF8String.fromString(Unk)))
      out.add(UTF8String.fromString(fp))
      pos += found
    }
    new GenericArrayData(out.toArray)
  }

  /** Column API: greedy WordPiece segmentation of `word` under the piece
    * set (ships as one broadcast-as-literal hash set).
    */
  def segment(word: Column, vocab: Set[String], maxPiece: Int): Column =
    ColumnBridge.column(
      WordPieceSegmentExpr(ColumnBridge.expression(word), vocab.toSeq.sorted, maxPiece))
}

case class WordPieceSegmentExpr(
    child: Expression,
    vocab: Seq[String],
    maxPiece: Int
) extends UnaryExpression {

  require(maxPiece >= 1, "maxPiece >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_wordpiece_segment"

  @transient private lazy val set: java.util.HashSet[String] = {
    val t = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(t.add)
    t
  }

  override def nullSafeEval(input: Any): Any =
    WordPieceSegment.segmentKernel(input.asInstanceOf[UTF8String], set, maxPiece)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordpieceVocab", set, "java.util.HashSet")
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.WordPieceSegment.segmentKernel($c, $setRef, $maxPiece)")
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceSegmentExpr =
    copy(child = newChild)
}
