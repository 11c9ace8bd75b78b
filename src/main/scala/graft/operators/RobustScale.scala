package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group robust standardization — median/MAD z-scores, the outlier-
  * immune sibling of mean/σ scaling ([[Anomaly]]'s z): a single fat-finger
  * value shifts a mean arbitrarily but moves a median by at most one rank,
  * so robust z-scores stay meaningful on exactly the data that needs
  * outlier handling. z = (x − median) / (1.4826 · MAD), the consistency
  * constant making MAD estimate σ under normality.
  *
  * Same exact/approx twin contract as [[Winsorize]]:
  *   - `exact = true`: interpolated `percentile` (≡ DuckDB quantile_cont —
  *     the round-10 parity) as window aggregates; two stacked windows on
  *     ONE group partitioning (median, then median of |x − median|), so
  *     Catalyst plans a single exchange. Oracle-able; per-group sort cost.
  *   - `exact = false`: `approx_percentile` (GK sketch, mergeable) — the
  *     unbounded-group 100-TB spelling, banded against exact by the spec.
  *
  * median and MAD round to 6 decimals BEFORE the z division on both
  * engines, so z derives from identical doubles; z itself rounds too.
  * Zero-MAD groups (a majority-constant metric) yield null z — flagging
  * "no robust scale exists" beats fabricating ±∞.
  */
object RobustScale {

  def zScores(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      exact: Boolean = true,
      accuracy: Int = 10000
  ): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val w = Window.partitionBy(keyCols.map(col): _*)
    val v = col(valueCol).cast("double")
    def med(c: org.apache.spark.sql.Column) =
      if (exact) percentile(c, lit(0.5)).over(w)
      else percentile_approx(c, lit(0.5), lit(accuracy)).over(w)
    df.withColumn("med", round(med(v), 6))
      .withColumn("mad", round(med(abs(v - col("med"))), 6))
      .withColumn("robust_z",
        when(col("mad") > 0,
          round((v - col("med")) / (lit(1.4826) * col("mad")), 6)))
  }
}
