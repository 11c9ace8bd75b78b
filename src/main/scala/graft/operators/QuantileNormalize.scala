package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Quantile normalization across sources — the step every multi-source
  * curation pipeline runs after profiling ([[SourceProfile]] is the
  * diagnostic half): each document's score is replaced by the value at
  * the SAME quantile of the POOLED score distribution, so per-source
  * batch effects (one crawl's systematically longer pages, one source's
  * shifted quality scale) vanish while within-source ordering is
  * preserved exactly (Bolstad 2003's microarray normalization, the
  * rank-interpolation form).
  *
  * Semantics: a doc with value v in source s takes average 0-based rank
  * r̄ = cum_below + (ties−1)/2 within its source (ties share one rank, so
  * equal inputs normalize equally); its pooled position is
  * p = r̄·(N−1)/(n_s−1), and the output is the linear interpolation
  * between pooled order statistics S[⌊p⌋] and S[⌊p⌋+1]. A single-doc
  * source maps to the pooled median.
  *
  * Determinism: ranks are DOUBLED to stay integers (R2 = 2·cum_below +
  * ties − 1, the Mann–Whitney spelling); the bracket is integer math —
  * A = R2·(N−1), D = 2·(n_s−1), lo = A DIV D, rem = A mod D (all
  * non-negative, so Spark DIV ≡ DuckDB //); the only float is the final
  * S_lo + rem/D·(S_hi−S_lo), one identically-spelled IEEE expression.
  * BIGINT headroom: A ≤ 2·n_s·N — exact past N = 2×10⁹ docs.
  *
  * Scale shape: NO per-doc ranking. Both ranks and order statistics come
  * from value HISTOGRAMS (groupBy (source, v) / groupBy v), so every
  * window runs over distinct-value rows — bounded by the value domain,
  * not the corpus (for unbounded real-valued scores, bucketize to the
  * round-6 grid first). The pooled histogram is broadcast to the two
  * bracket lookups, and docs re-join their normalized value on
  * (source, v) — an equi-join against the small mapping frame.
  */
object QuantileNormalize {

  /** (idCol, sourceCol, valueCol, norm_<valueCol>) — one row per input
    * doc; norm is the pooled-distribution value at the doc's
    * within-source quantile.
    */
  def toPooled(
      docs: DataFrame,
      sourceCol: String = "source",
      valueCol: String = "n_chars",
      idCol: String = "doc_id"
  ): DataFrame = {
    val d = docs.select(
      col(idCol), col(sourceCol).as("src"), col(valueCol).cast("long").as("v"))

    val srcHist = d.groupBy(col("src"), col("v")).agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy(col("src")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val srcRanked = srcHist
      .withColumn("cum_below", coalesce(sum(col("cnt")).over(wCum), lit(0L)))
      .withColumn("n_s", sum(col("cnt")).over(Window.partitionBy(col("src"))))

    val poolHist = d.groupBy(col("v")).agg(count(lit(1)).as("pcnt"))
    // histogram-sized single-partition window: |distinct values| rows
    val pool = poolHist
      .withColumn("pcum_below", coalesce(
        sum(col("pcnt")).over(
          Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val nTotal = d.agg(count(lit(1)).as("n_total"))

    val keyed = srcRanked.crossJoin(broadcast(nTotal))
      .withColumn("r2", lit(2L) * col("cum_below") + col("cnt") - lit(1L))
      .withColumn("a",
        when(col("n_s") === 1L, col("n_total") - 1L)
          .otherwise(col("r2") * (col("n_total") - 1L)))
      .withColumn("dd",
        when(col("n_s") === 1L, lit(2L)).otherwise(lit(2L) * (col("n_s") - 1L)))
      .withColumn("lo", expr("a DIV dd"))
      .withColumn("rem", expr("a % dd"))
      .withColumn("hi", least(expr("a DIV dd") + lit(1L), col("n_total") - 1L))

    val sLo = pool.select(col("v").as("slo_v"), col("pcum_below").as("lo_s"),
      (col("pcum_below") + col("pcnt")).as("lo_e"))
    val sHi = pool.select(col("v").as("shi_v"), col("pcum_below").as("hi_s"),
      (col("pcum_below") + col("pcnt")).as("hi_e"))
    val mapped = keyed
      .join(broadcast(sLo), col("lo") >= col("lo_s") && col("lo") < col("lo_e"))
      .join(broadcast(sHi), col("hi") >= col("hi_s") && col("hi") < col("hi_e"))
      .select(col("src"), col("v"),
        (col("slo_v").cast("double") +
          col("rem").cast("double") / col("dd").cast("double") *
            (col("shi_v") - col("slo_v")).cast("double")).as("norm"))

    d.join(mapped, Seq("src", "v"))
      .select(col(idCol), col("src").as(sourceCol), col("v").as(valueCol),
        col("norm").as(s"norm_$valueCol"))
  }
}
