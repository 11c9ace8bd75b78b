package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-rater agreement for labeled-data QA — Fleiss' kappa (Fleiss
  * 1971) over three deterministic heuristic "raters", each binning every
  * document into {0 short/low, 1 mid, 2 long/high} from a different
  * signal. Label pipelines run exactly this to decide whether a rating
  * rubric is usable before training on the labels; here the raters are
  * pure functions of the text so the whole statistic replays in SQL.
  *
  * Raters (all integer comparisons — cross-multiplied ratios, never a
  * float threshold, so engines can't disagree at the boundary):
  *   r1: raw length      — n_chars < 150 | < 300 | else
  *   r2: distinct-token ratio — ndis/ntok < 0.4 | < 0.7 | else
  *   r3: mean token length    — chars/ntok < 4 | < 5 | else
  * Tokenless docs rate 0 from every rater (perfect trivial agreement).
  *
  * Scale shape: one codegen'd projection (per-doc category counts and
  * their squared sum) + one grouped aggregation of exact BIGINTs — the
  * kappa itself is arithmetic over five integers per group. Zero joins,
  * zero corpus-scale state.
  */
object Agreement {

  private def cat(lt1: Column, lt2: Column): Column =
    when(lt1, 0).when(lt2, 1).otherwise(2)

  /** Per-doc rater categories + per-category rater counts. */
  def fleissRatings(docs: DataFrame): DataFrame = {
    val toks = Repetition.words(col("text"))
    val df = docs.select(
      col("doc_id"), col("lang"), col("n_chars"),
      size(toks).as("ntok"),
      size(array_distinct(toks)).as("ndis"),
      length(array_join(toks, "")).as("tchars"))
    val r1 = cat(col("n_chars") < 150, col("n_chars") < 300)
    val r2 = when(col("ntok") === 0, 0)
      .otherwise(cat(col("ndis") * 10 < col("ntok") * 4, col("ndis") * 10 < col("ntok") * 7))
    val r3 = when(col("ntok") === 0, 0)
      .otherwise(cat(col("tchars") < col("ntok") * 4, col("tchars") < col("ntok") * 5))
    val rated = df.select(col("doc_id"), col("lang"),
      r1.as("r1"), r2.as("r2"), r3.as("r3"))
    def nj(c: Int): Column =
      ((col("r1") === c).cast("long") + (col("r2") === c).cast("long") +
        (col("r3") === c).cast("long"))
    rated.select(col("doc_id"), col("lang"),
      col("r1"), col("r2"), col("r3"),
      nj(0).as("nj0"), nj(1).as("nj1"), nj(2).as("nj2"))
  }

  /** Per-language exact-integer aggregate shared by Fleiss' κ and
    * Krippendorff's α: doc count, Σ_i Σ_j n_ij², category marginals.
    */
  private def grouped(docs: DataFrame): DataFrame =
    fleissRatings(docs)
      .select(col("lang"),
        (col("nj0") * col("nj0") + col("nj1") * col("nj1") +
          col("nj2") * col("nj2")).as("s"),
        col("nj0"), col("nj1"), col("nj2"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("s")).as("s_sum"),
        sum(col("nj0")).as("c0"), sum(col("nj1")).as("c1"), sum(col("nj2")).as("c2"))

  /** Fleiss' kappa per language: P̄ from Σ_i Σ_j n_ij² (3 raters →
    * P_i = (S_i − 3)/6), P̄_e from category marginals. The five grouped
    * sums are exact BIGINTs; only the final κ is a (round-6) double.
    */
  def fleissKappa(docs: DataFrame): DataFrame = {
    val g = grouped(docs)
    val pbar = (col("s_sum") - lit(3L) * col("n_docs")).cast("double") /
      (lit(6L) * col("n_docs")).cast("double")
    val pe = (col("c0") * col("c0") + col("c1") * col("c1") +
      col("c2") * col("c2")).cast("double") /
      (lit(9L) * col("n_docs") * col("n_docs")).cast("double")
    g.select(col("lang"), col("n_docs"), col("s_sum"),
      col("c0"), col("c1"), col("c2"),
      when(pe === 1.0, lit(0.0))
        .otherwise(round((pbar - pe) / (lit(1.0) - pe), 6)).as("kappa"))
  }

  /** Krippendorff's alpha (nominal) per language over the same raters:
    * α = 1 − D_o/D_e with (3 raters, no missing) D_o = (9N − ΣS_i)/(6N)
    * — the per-item identity Σ_c n_ic(3 − n_ic) = 9 − S_i — and
    * D_e = Σ_c m_c(M − m_c) / (M(M−1)), M = 3N. The numerators ship as
    * exact BIGINT columns so the hash pins the integer algebra, not just
    * the final double. Width bound: m_c(M − m_c) needs M < ~3·10⁹.
    */
  def krippendorffAlpha(docs: DataFrame): DataFrame = {
    val g = grouped(docs)
    val bigM = lit(3L) * col("n_docs")
    val doNum = lit(9L) * col("n_docs") - col("s_sum")
    val deNum = col("c0") * (bigM - col("c0")) + col("c1") * (bigM - col("c1")) +
      col("c2") * (bigM - col("c2"))
    val doD = doNum.cast("double") / (lit(6L) * col("n_docs")).cast("double")
    val deD = deNum.cast("double") / (bigM * (bigM - 1)).cast("double")
    g.select(col("lang"), col("n_docs"),
      doNum.as("do_num"), deNum.as("de_num"),
      when(deNum === 0, lit(0.0))
        .otherwise(round(lit(1.0) - doD / deD, 6)).as("alpha"))
  }
}
