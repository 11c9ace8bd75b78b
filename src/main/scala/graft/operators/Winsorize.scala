package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group winsorization — clip a metric to its group's [pLo, pHi]
  * quantile fences, the standard outlier treatment before feature
  * scaling / loss computation (a fat-finger value or bot burst otherwise
  * drags every downstream mean, σ, and OLS fit).
  *
  * Two spellings, one contract:
  *   - `exact = true`: exact interpolated percentiles (Spark `percentile`
  *     ≡ DuckDB `quantile_cont`) as window aggregates over the group —
  *     oracle-able; the per-group sort is the cost, acceptable when
  *     groups are bounded (q_winsorize runs this).
  *   - `exact = false`: `approx_percentile` (GK sketch, mergeable, no
  *     per-group sort) — the 100-TB spelling for unbounded groups, same
  *     pattern as [[QualityBuckets]]'s NTILE-vs-GK pair; spec bands it
  *     against the exact fences.
  *
  * Fences are ROUND-6 before the clip comparison on both engines, so
  * boundary rows cannot flip on a last-ulp interpolation difference.
  */
object Winsorize {

  def clipPerGroup(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      pLo: Double = 0.01,
      pHi: Double = 0.99,
      exact: Boolean = true,
      accuracy: Int = 10000
  ): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(0 <= pLo && pLo < pHi && pHi <= 1, "need 0 <= pLo < pHi <= 1")
    val w = Window.partitionBy(keyCols.map(col): _*)
    val v = col(valueCol).cast("double")
    val (lo, hi) =
      if (exact)
        (percentile(v, lit(pLo)).over(w), percentile(v, lit(pHi)).over(w))
      else
        (percentile_approx(v, lit(pLo), lit(accuracy)).over(w),
          percentile_approx(v, lit(pHi), lit(accuracy)).over(w))
    df.withColumn("fence_lo", round(lo, 6))
      .withColumn("fence_hi", round(hi, 6))
      .withColumn("clipped",
        least(greatest(v, col("fence_lo")), col("fence_hi")))
  }
}
