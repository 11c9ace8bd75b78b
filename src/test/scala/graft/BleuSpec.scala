package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Bleu

/** Hand-traced BLEU / ROUGE cases: identical pair → 1.0, a partially
  * overlapping pair with a zero 4-gram order → BLEU 0, short/empty-doc
  * gram guards, and the pair-construction contract.
  */
final class BleuSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "source", "text")
  }

  test("identical candidate/reference pair scores BLEU 1.0") {
    val d = docs(
      (0L, "sA", "the cat sat on the mat"),
      (1L, "sA", "the cat sat on the mat"))
    val r = Bleu.corpusBleu(d).collect().head
    assert(r.getAs[Long]("n_pairs") === 1L)
    assert(r.getAs[Double]("p1") === 1.0)
    assert(r.getAs[Double]("p4") === 1.0)
    assert(r.getAs[Double]("bp") === 1.0)
    assert(r.getAs[Double]("bleu") === 1.0)
  }

  test("partial overlap: clipped precisions by hand, zero 4-gram => BLEU 0") {
    // cand "a b c d e" vs ref "a b c x y": m1=3/5, m2=2/4, m3=1/3, m4=0/2
    val d = docs((2L, "sB", "a b c d e"), (3L, "sB", "a b c x y"))
    val r = Bleu.corpusBleu(d).collect().head
    assert(r.getAs[Double]("p1") === 0.6)
    assert(r.getAs[Double]("p2") === 0.5)
    assert(r.getAs[Double]("p3") === 0.333333)
    assert(r.getAs[Double]("p4") === 0.0)
    assert(r.getAs[Double]("bleu") === 0.0)
  }

  test("clipping caps repeated candidate grams at the reference count") {
    // cand "the the the" vs ref "the cat": m1 = min(3, 1) = 1, t1 = 3
    val d = docs((0L, "sC", "the the the"), (1L, "sC", "the cat"))
    val r = Bleu.corpusBleu(d).collect().head
    assert(r.getAs[Double]("p1") === 0.333333)
    // bp: cand 3 tokens >= ref 2 tokens -> 1.0
    assert(r.getAs[Double]("bp") === 1.0)
  }

  test("brevity penalty fires when the candidate is shorter") {
    // cand 2 tokens, ref 4 tokens -> bp = exp(1 - 4/2) = exp(-1)
    val d = docs((0L, "sD", "a b"), (1L, "sD", "a b c d"))
    val r = Bleu.corpusBleu(d).collect().head
    assert(math.abs(r.getAs[Double]("bp") - math.exp(-1.0)) < 1e-6)
  }

  test("ROUGE-1/2 per-pair P/R/F1 macro-average by hand") {
    // pair: cand "a b c d e" / ref "a b c x y" -> rouge1 P=R=F=0.6
    // rouge2: m=2, tc=4, tr=4 -> P=R=F=0.5
    val d = docs((2L, "sB", "a b c d e"), (3L, "sB", "a b c x y"))
    val rows = Bleu.rougeCorpus(d).collect().map(r =>
      r.getAs[Int]("n") -> r).toMap
    assert(rows(1).getAs[Double]("avg_f1") === 0.6)
    assert(rows(2).getAs[Double]("avg_f1") === 0.5)
    assert(rows(1).getAs[Double]("avg_p") === 0.6)
    assert(rows(2).getAs[Double]("avg_r") === 0.5)
  }

  test("chrF2: identical pair scores 1.0; disjoint pair scores 0.0") {
    val d = docs(
      (0L, "sA", "abcdef"), (1L, "sA", "abcdef"),
      (2L, "sB", "aaaaaa"), (3L, "sB", "zzzzzz"))
    val got = Bleu.chrF(d).collect().map(r => r.getString(0) -> r).toMap
    assert(got("sA").getAs[Double]("avg_chrf2") === 1.0)
    assert(got("sB").getAs[Double]("avg_chrf2") === 0.0)
  }

  test("chrF2 hand case: per-order means and the beta=2 harmonic") {
    // cand "abcd" / ref "abcz" (whitespace stripped): per order n=1..6
    // m: 3,2,1,0,0,0; tc=tr: 4,3,2,1,0,0 -> P_n=R_n: .75,.666667,.5,0,0,0
    // mean over 6 = (750000+666667+500000)//6 = 319444 micros
    // F2 = 5PR/(4P+R) with P=R -> F = P
    val d = docs((0L, "s", "ab cd"), (1L, "s", "ab cz"))
    val r = Bleu.chrF(d).collect().head
    assert(r.getAs[Double]("avg_chrp") === 0.319444)
    assert(r.getAs[Double]("avg_chrr") === 0.319444)
    assert(r.getAs[Double]("avg_chrf2") === 0.319444)
  }

  test("odd doc_ids never start a pair; unmatched even docs drop") {
    // 0 pairs with 1; 1 is odd (never a candidate); 2 has no successor
    val d = docs((0L, "s", "x"), (1L, "s", "x"), (2L, "s", "x"))
    assert(Bleu.pairDocs(d).count() === 1L)
  }

  test("clippedMatch fold: multiset intersection, not set intersection") {
    import spark.implicits._
    def m(a: Seq[String], b: Seq[String]): Long =
      Seq((a, b)).toDF("a", "b")
        .select(Bleu.clippedMatch(col("a"), col("b")).as("m"))
        .collect().head.getLong(0)
    // repeated gram clips at the smaller multiplicity
    assert(m(Seq("x", "x", "x", "y"), Seq("x", "x", "z")) === 2L)
    // disjoint and empty edges
    assert(m(Seq("a"), Seq("b")) === 0L)
    assert(m(Seq.empty, Seq("a")) === 0L)
    assert(m(Seq.empty, Seq.empty) === 0L)
    // order-independent (the fold sorts)
    assert(m(Seq("b", "a", "b"), Seq("b", "b", "a")) === 3L)
  }

  test("native overlap kernels match the HOF fold on real corpus pairs") {
    import graft.expressions.OverlapKernels
    import graft.operators.Repetition
    val pairs = Bleu.pairDocs(
      graft.sources.Tables(spark, TestSpark.Sf0001).documents)
    // word orders 1..4: kernel m_n == fold over the HOF gram arrays
    val w = pairs.select(
      (OverlapKernels.wordOverlap(col("cand"), col("ref")).as("ov")) +:
        (1 to 4).map { n =>
          Bleu.clippedMatch(
            Bleu.grams(Repetition.words(col("cand")), n),
            Bleu.grams(Repetition.words(col("ref")), n)).as(s"h$n")
        }: _*)
    val wBad = w.where((1 to 4).map(n =>
      col(s"ov.m$n") =!= col(s"h$n")).reduce(_ || _)).count()
    assert(wBad === 0L, "word kernel diverges from the HOF fold")
    // kernel token counts match the HOF tokenization
    val tBad = pairs.select(
      OverlapKernels.wordOverlap(col("cand"), col("ref")).as("ov"),
      size(Repetition.words(col("cand"))).cast("long").as("nc"),
      size(Repetition.words(col("ref"))).cast("long").as("nr"))
      .where(col("ov.nc") =!= col("nc") || col("ov.nr") =!= col("nr")).count()
    assert(tBad === 0L, "kernel tokenization diverges from Repetition.words")
  }

  test("char kernel matches a substr-built HOF fold on real corpus pairs") {
    import graft.expressions.OverlapKernels
    import graft.operators.Repetition
    def charGram(s: org.apache.spark.sql.Column, n: Int) = {
      val nG = length(s) - (n - 1)
      when(nG >= 1, transform(sequence(lit(1), nG), j => s.substr(j, lit(n))))
        .otherwise(typedLit(Seq.empty[String]))
    }
    val pairs = Bleu.pairDocs(
      graft.sources.Tables(spark, TestSpark.Sf0001).documents)
      .select(col("cand").as("ct"), col("ref").as("rt"),
        array_join(Repetition.words(col("cand")), "").as("cs"),
        array_join(Repetition.words(col("ref")), "").as("rs"))
    val c = pairs.select(
      (OverlapKernels.charOverlap(col("ct"), col("rt")).as("ov")) +:
        (1 to 6).map { n =>
          Bleu.clippedMatch(charGram(col("cs"), n), charGram(col("rs"), n)).as(s"h$n")
        }: _*)
    val cBad = c.where((1 to 6).map(n =>
      col(s"ov.m$n") =!= col(s"h$n")).reduce(_ || _)).count()
    assert(cBad === 0L, "char kernel diverges from the HOF fold")
  }
}
