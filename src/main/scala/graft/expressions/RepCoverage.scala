package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass native kernel for the Gopher A1.2 character-coverage metrics
  * ([[graft.operators.RepetitionCoverage]]) — the covered-character
  * integers for top-{2,3,4} and dup-{5..10} word n-grams in a single
  * tight loop per document.
  *
  * The HOF spelling (kept as `RepetitionCoverage.gatesHof` for the
  * equivalence spec) pays one sorted-array fold + one membership
  * `transform` + one interval-merge fold PER n — 9 expression-tree
  * traversals per doc with per-element struct allocation; at sf0.1 that
  * was the round-14 bench's most expensive scan query (6.3 s TimeQ). This
  * kernel tokenizes once, builds each n's gram strings with one rolling
  * StringBuilder, counts them in a HashMap, and folds the interval union
  * over a prefix-sum of token lengths — identical values (the spec pins
  * kernel ≡ HOF on the fixture corpus), the [[TextSketches]] precedent.
  *
  * Exactness notes mirrored from the HOF spelling:
  *  - tokens = `lower(text)` split on java `\s+`, empties dropped
  *    (UTF8String.toLowerCase, matching Spark's `lower`);
  *  - char counts are CODE POINTS (Spark `length`), not UTF-16 units;
  *  - top-n ties break to the smallest gram in UTF-8 BYTE order (what
  *    `array_sort` used) — code-point comparison, which equals byte order.
  */
object RepCoverage {

  val TopNs: Array[Int] = Array(2, 3, 4)
  val DupNs: Array[Int] = Array(5, 6, 7, 8, 9, 10)

  val Schema: StructType = StructType(
    Seq(StructField("n_words", LongType, nullable = false),
      StructField("sum_len", LongType, nullable = false)) ++
      TopNs.map(n => StructField(s"top$n", LongType, nullable = false)) ++
      DupNs.map(n => StructField(s"dup$n", LongType, nullable = false)))

  /** UTF-8 byte order == code-point order; Java String.compareTo is
    * UTF-16-unit order, which differs for supplementary characters.
    */
  private def cpCompare(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return java.lang.Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    java.lang.Integer.compare(a.length - i, b.length - j)
  }

  private def cp(s: String): Long = s.codePointCount(0, s.length).toLong

  /** Gram strings for one n (single-space joined), empty when L < n. */
  private def grams(toks: Array[String], n: Int): Array[String] = {
    val nG = toks.length - n + 1
    if (nG <= 0) return Array.empty
    val out = new Array[String](nG)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < nG) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = sb.toString
      i += 1
    }
    out
  }

  private def counts(g: Array[String]): java.util.HashMap[String, Int] = {
    val m = new java.util.HashMap[String, Int](g.length * 2)
    var i = 0
    while (i < g.length) {
      m.merge(g(i), 1, (a, b) => a + b)
      i += 1
    }
    m
  }

  /** covered chars of the most frequent n-gram (count × its token chars);
    * ties to the byte-order-smallest gram. 0 when there are no grams.
    */
  private def topCovered(g: Array[String], n: Int): Long = {
    if (g.isEmpty) return 0L
    val m = counts(g)
    var best = 0
    var bestG: String = null
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue
      if (c > best || (c == best && cpCompare(e.getKey, bestG) < 0)) {
        best = c
        bestG = e.getKey
      }
    }
    best.toLong * (cp(bestG) - (n - 1).toLong)
  }

  /** chars of token positions covered by any n-gram occurring ≥ 2 times,
    * each position once — ascending-start interval merge over a prefix
    * sum of token lengths (`lenPrefix(i)` = Σ lens[0..i-1]).
    */
  private def dupCovered(g: Array[String], lenPrefix: Array[Long], n: Int): Long = {
    if (g.isEmpty) return 0L
    val m = counts(g)
    var acc = 0L
    var lastEnd = 0 // 1-indexed last covered position
    var j = 1
    while (j <= g.length) {
      if (m.get(g(j - 1)) >= 2) {
        val lo = math.max(j, lastEnd + 1)
        val hi = j + n - 1
        acc += lenPrefix(hi) - lenPrefix(lo - 1)
        lastEnd = hi
      }
      j += 1
    }
    acc
  }

  /** The full metric row: (n_words, sum_len, top2..4, dup5..10). */
  def kernel(input: UTF8String): InternalRow = {
    val toks0 = input.toLowerCase.toString.split("\\s+")
    var nTok = 0
    var i = 0
    while (i < toks0.length) { if (toks0(i).nonEmpty) nTok += 1; i += 1 }
    val toks = new Array[String](nTok)
    var k = 0
    i = 0
    while (i < toks0.length) {
      if (toks0(i).nonEmpty) { toks(k) = toks0(i); k += 1 }
      i += 1
    }
    val lenPrefix = new Array[Long](nTok + 1)
    i = 0
    while (i < nTok) {
      lenPrefix(i + 1) = lenPrefix(i) + cp(toks(i))
      i += 1
    }
    val out = new Array[Any](2 + TopNs.length + DupNs.length)
    out(0) = nTok.toLong
    out(1) = lenPrefix(nTok)
    var o = 2
    var t = 0
    while (t < TopNs.length) {
      out(o) = topCovered(grams(toks, TopNs(t)), TopNs(t))
      o += 1
      t += 1
    }
    var d = 0
    while (d < DupNs.length) {
      out(o) = dupCovered(grams(toks, DupNs(d)), lenPrefix, DupNs(d))
      o += 1
      d += 1
    }
    new GenericInternalRow(out)
  }

  /** Column API. */
  def coverage(text: Column): Column =
    ColumnBridge.column(RepCoverageExpr(ColumnBridge.expression(text)))
}

/** Struct of the 11 covered-character integers; codegen calls the static
  * kernel so the scan stays one WholeStageCodegen span.
  */
case class RepCoverageExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = RepCoverage.Schema
  override def prettyName: String = "graft_rep_coverage"

  override def nullSafeEval(input: Any): Any =
    RepCoverage.kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.RepCoverage.kernel($c)")

  override protected def withNewChildInternal(newChild: Expression): RepCoverageExpr =
    copy(child = newChild)
}
