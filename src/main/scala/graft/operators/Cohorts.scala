package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cohort retention matrix — the product-analytics staple: users are
  * cohorted by the period (day/week) of their FIRST activity, and cell
  * (cohort, offset) counts how many of that cohort were active `offset`
  * periods later. `retention` normalizes each cell by the cohort's size
  * (its offset-0 count, which by construction every cohort has: a user's
  * first-activity period is itself an active period).
  *
  * Scale shape: one shuffle on user (`groupBy(user)` folds each user's
  * activity to its distinct-period set — bounded by timeline/period, e.g.
  * ≤ 366 for a year of daily cohorts, NOT by event count), then one
  * shuffle of the exploded (user, offset) pairs to the matrix cells. The
  * cohort-size window runs over the aggregated matrix — |cohorts| ×
  * |offsets| rows, never the fact table. No count-distinct Expand: the
  * per-user set is deduplicated in the first aggregate, so the cell count
  * is a plain `count`.
  *
  * Numeric discipline: periods and counts are exact integers; the only
  * float is the final retention ratio, rounded to 6 decimals on both
  * engines.
  *
  * Reference anchor: extends the reference's per-session/user activity
  * aggregations (`src/batch/preprocessing.py` session features) to the
  * longitudinal engagement surface its dashboards stop short of.
  */
object Cohorts {

  /** @param tsSecCol name of an epoch-SECONDS column (long; post-1970 —
    *                 `DIV` bucketing truncates toward zero).
    * @return (cohort, period_offset, n_active, cohort_size, retention) —
    *         cohort is the period index (epoch_s DIV periodSeconds).
    */
  def retention(
      df: DataFrame,
      userCol: String = "user_id",
      tsSecCol: String = "ts_s",
      periodSeconds: Long = 86400L
  ): DataFrame = {
    val byUser = df
      .select(col(userCol).as("u"),
        expr(s"CAST($tsSecCol AS LONG) DIV $periodSeconds").as("period"))
      .groupBy(col("u"))
      .agg(min(col("period")).as("cohort"), collect_set(col("period")).as("active"))
    val cells = byUser
      .select(col("cohort"), explode(col("active")).as("p"))
      .select(col("cohort"), (col("p") - col("cohort")).as("period_offset"))
      .groupBy(col("cohort"), col("period_offset"))
      .agg(count(lit(1)).as("n_active"))
    val wc = Window.partitionBy(col("cohort"))
    cells
      .withColumn("cohort_size",
        max(when(col("period_offset") === 0, col("n_active"))).over(wc))
      .withColumn("retention",
        round(col("n_active").cast("double") / col("cohort_size"), 6))
      .select(col("cohort"), col("period_offset"), col("n_active"),
        col("cohort_size"), col("retention"))
  }
}
