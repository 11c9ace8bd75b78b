package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mann–Kendall trend test + Theil–Sen slope — the NONPARAMETRIC twin of
  * [[Trend]]'s closed-form OLS: S = Σ over pairs of sign(y_j − y_i) is
  * outlier-immune and distribution-free (the standard monitoring-series
  * trend test), and the Theil–Sen estimator is the median of pairwise
  * slopes (robust to ~29% contamination).
  *
  * Scale contract: this runs over an AGGREGATED series (daily/hourly
  * rollups — n small BY CONSTRUCTION, the caller aggregates first), so
  * the O(n²) pair join and the pair-table window are bounded; it is NOT
  * for raw event streams. Exactness: S and the pair count are exact
  * BIGINTs; Kendall's τ is one replayed division; the Theil–Sen slope is
  * the LOWER MEDIAN pair's single double ratio (rank `(P+1) DIV 2` under
  * (slope, x1, x2) — a selected value, never an average of floats),
  * floor-6 quantized.
  */
object RobustTrend {

  /** 1 row: `(n_points, n_pairs, s_stat, tau_e6, theil_sen_slope_e6)`
    * over an integer series `(xCol, yCol)` with unique x. Requires ≥ 2
    * points.
    */
  def mannKendallTheilSen(series: DataFrame, xCol: String, yCol: String): DataFrame = {
    val s = series.select(col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
    val a = s.select(col("x").as("x1"), col("y").as("y1"))
    val b = s.select(col("x").as("x2"), col("y").as("y2"))
    val pairs = a.join(b, col("x2") > col("x1"))
    val agg = pairs.agg(
      count(lit(1)).as("n_pairs"),
      sum(when(col("y2") > col("y1"), 1L)
        .when(col("y2") < col("y1"), -1L)
        .otherwise(0L)).as("s_stat"))
    val npts = s.agg(count(lit(1)).as("n_points"))
    val slopes = pairs.select(
      ((col("y2") - col("y1")).cast("double")
        / (col("x2") - col("x1")).cast("double")).as("sl"),
      col("x1"), col("x2"))
    // bounded by contract: the window orders the n(n−1)/2-row pair table
    val w = Window.orderBy(col("sl"), col("x1"), col("x2"))
    val med = slopes.withColumn("rn", row_number().over(w))
      .crossJoin(broadcast(agg.select(col("n_pairs").as("_p"))))
      .filter(col("rn") === expr("(_p + 1) DIV 2"))
      .select(floor(col("sl") * lit(1000000.0d) + lit(0.5d)).cast("long")
        .as("theil_sen_slope_e6"))
    npts.crossJoin(broadcast(agg)).crossJoin(broadcast(med))
      .select(col("n_points"), col("n_pairs"), col("s_stat"),
        floor(col("s_stat").cast("double") / col("n_pairs").cast("double")
          * lit(1000000.0d) + lit(0.5d)).cast("long").as("tau_e6"),
        col("theil_sen_slope_e6"))
  }
}
