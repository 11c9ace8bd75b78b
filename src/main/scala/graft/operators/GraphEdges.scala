package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared spelling for "both directions of an undirected edge list".
  *
  * Every iterative graph operator needs `(a,b) ∪ (b,a)`. The naive
  * `e.union(e.swap)` spelling references the edge-builder subplan TWICE —
  * and the shingle near-dup edge builder behind q_pagerank / q_kcore /
  * q_dedup_components is two shuffles over the exploded shingle stream, so
  * the union doubles the most expensive stage of the whole query (guide
  * §2.4: remove duplicated subtrees). `explode` over an inline 2-element
  * array produces the identical bag of rows from ONE pass: same
  * multiplicities, same types, one build.
  */
object GraphEdges {

  /** `(a, b)` and `(b, a)` for every input edge, from a single pass.
    * `carry` columns ride along unchanged on both copies (e.g. an edge
    * weight). Duplicate input edges stay duplicated — exactly what the
    * union spelling produced.
    */
  def bothDirections(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      carry: Seq[String] = Nil
  ): DataFrame = {
    // array(fwd, rev) needs identical struct field types; the union
    // spelling this replaced would have type-coerced mixed src/dst types
    // silently, so make the precondition explicit (r21, ADVICE)
    val st = edges.schema(srcCol).dataType
    val dt = edges.schema(dstCol).dataType
    require(st == dt,
      s"bothDirections needs matching src/dst types, got $st vs $dt — cast explicitly")
    val fwd = struct(
      (col(srcCol).as("a") +: col(dstCol).as("b") +: carry.map(col)): _*)
    val rev = struct(
      (col(dstCol).as("a") +: col(srcCol).as("b") +: carry.map(col)): _*)
    edges
      .select(explode(array(fwd, rev)).as("_e"))
      .select((col("_e.a").as("a") +: col("_e.b").as("b") +:
        carry.map(c => col(s"_e.$c").as(c))): _*)
  }
}
