package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group closed-form OLS trend — slope/intercept/R² of y over time for
  * every key, from one aggregation pass of sufficient statistics
  * (n, Σx, Σy, Σxy, Σx², Σy²). The per-entity trend primitive: value drift
  * per user, volume trend per source — at any group count, because there
  * is no window over observations and no iteration.
  *
  * Numeric discipline (what makes this oracle-able):
  *   - x is rebased to the group's min and divided by `xScale` (hours for
  *     epoch seconds), so Σx² stays far below 2^53 — raw epoch seconds
  *     squared would silently lose integer precision in doubles;
  *   - the six sufficient statistics are ROUND-6 before any derived
  *     arithmetic, on both engines, so slope/intercept/R² are computed
  *     from identical inputs with identical IEEE ops — bitwise equal, not
  *     merely close (q_trend_slopes hash-matches);
  *   - degenerate groups (constant x, or constant y for R²) emit null
  *     rather than dividing by zero (ANSI-safe).
  *
  * The min-rebase window and the stats aggregate share one key
  * partitioning — a single exchange end to end.
  */
object Trend {

  def olsPerGroup(
      df: DataFrame,
      keyCols: Seq[String],
      xCol: String,
      yCol: String,
      xScale: Double = 3600.0
  ): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(xScale > 0, "xScale must be positive")
    val keys = keyCols.map(col)
    val based = df
      .withColumn("_xmin", min(col(xCol)).over(Window.partitionBy(keys: _*)))
      .withColumn("_x", (col(xCol) - col("_xmin")) / lit(xScale))
      .withColumn("_y", col(yCol).cast("double"))
    val stats = based.groupBy(keys: _*).agg(
      count(lit(1)).as("n"),
      round(sum(col("_x")), 6).as("sx"),
      round(sum(col("_y")), 6).as("sy"),
      round(sum(col("_x") * col("_y")), 6).as("sxy"),
      round(sum(col("_x") * col("_x")), 6).as("sxx"),
      round(sum(col("_y") * col("_y")), 6).as("syy"))
    val nD = col("n").cast("double")
    val cov = nD * col("sxy") - col("sx") * col("sy")
    val varX = nD * col("sxx") - col("sx") * col("sx")
    val varY = nD * col("syy") - col("sy") * col("sy")
    val slope = when(varX > 0.0, cov / varX)
    val intercept = when(varX > 0.0, (col("sy") - (cov / varX) * col("sx")) / nD)
    val r2 = when(varX > 0.0 && varY > 0.0, (cov * cov) / (varX * varY))
    stats.select(keys ++ Seq(col("n"), col("sx"), col("sy"), col("sxy"),
      col("sxx"), col("syy"),
      round(slope, 6).as("slope"),
      round(intercept, 6).as("intercept"),
      round(r2, 6).as("r2")): _*)
  }
}
