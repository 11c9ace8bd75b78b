package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Wilson score interval for a binomial proportion per group — the
  * closed-form CI every conversion/pass-rate dashboard should use instead
  * of the normal approximation (valid at small n and extreme p; Wilson
  * 1927, Brown–Cai–DasGupta 2001's recommendation). Companion to the
  * Poisson-bootstrap interval ([[Bootstrap]]): same question, closed form
  * vs resampling.
  *
  * Determinism: n and pos are exact counts; the interval is a FIXED
  * double-arithmetic spelling (z spliced as one literal, sqrt correctly
  * rounded) evaluated identically by both engines, then floor-6
  * quantized. No float ever aggregates.
  */
object Binomial {

  /** z for a 95% two-sided interval, spliced verbatim into SQL replays. */
  val Z95: Double = 1.959963984540054d

  /** `(group_key, n, pos, p_e6, lo_e6, hi_e6)` per group; groups with
    * n = 0 cannot occur (they simply have no rows).
    */
  def wilson(
      df: DataFrame,
      successCol: String,
      groupCol: String,
      z: Double = Z95
  ): DataFrame = {
    val agg = df.groupBy(col(groupCol).as("group_key"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(successCol) === 1, 1L).otherwise(0L)).as("pos"))
    // one fixed spelling, identical in the SQL twin
    val zs = z.toString
    agg.selectExpr(
      "group_key", "n", "pos",
      "CAST(floor(CAST(pos AS DOUBLE) / CAST(n AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS p_e6",
      s"""CAST(floor(greatest(
         |  ((CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)) + $zs * $zs / (2.0 * CAST(n AS DOUBLE))
         |   - $zs * sqrt((CAST(pos AS DOUBLE) / CAST(n AS DOUBLE))
         |       * (1.0 - CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)
         |       + $zs * $zs / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
         |  / (1.0 + $zs * $zs / CAST(n AS DOUBLE)), 0.0) * 1000000.0 + 0.5) AS BIGINT)
         |  AS lo_e6""".stripMargin,
      s"""CAST(floor(least(
         |  ((CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)) + $zs * $zs / (2.0 * CAST(n AS DOUBLE))
         |   + $zs * sqrt((CAST(pos AS DOUBLE) / CAST(n AS DOUBLE))
         |       * (1.0 - CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)
         |       + $zs * $zs / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
         |  / (1.0 + $zs * $zs / CAST(n AS DOUBLE)), 1.0) * 1000000.0 + 0.5) AS BIGINT)
         |  AS hi_e6""".stripMargin)
  }
}
