package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pearson correlation matrix over a vector column — the feature-audit
  * companion of [[Pca]]: which embedding dimensions are redundant, which
  * engineered features co-move. Same two-phase design: the data pass is
  * the one [[graft.expressions.MomentMatrixAgg]] scan (shared with PCA —
  * one aggregate serves both consumers), the O(d²) correlation arithmetic
  * runs on the driver over the bounded stats object.
  *
  * rᵢⱼ = covᵢⱼ / (√covᵢᵢ · √covⱼⱼ), cov from the round-6 sufficient
  * statistics — identical IEEE on both engines (the generated oracle
  * replays the formula per pair). Zero-variance dimensions yield null
  * (undefined correlation), never a division by zero.
  */
object Correlation {

  /** Upper triangle incl. diagonal: (i, j, corr) for 0 ≤ i ≤ j < d. */
  def matrix(
      spark: SparkSession,
      df: DataFrame,
      vecCol: String,
      d: Int,
      roundTo: Option[Int] = Some(6)
  ): DataFrame = {
    import spark.implicits._
    val (n, s, q) = Pca.momentStats(df, vecCol, d, roundTo)
    require(n > 0, "Correlation.matrix: no usable vectors")
    val cov = Pca.covFromStats(n, s, q)
    val rows = for { i <- 0 until d; j <- i until d } yield {
      val corr =
        if (cov(i)(i) <= 0 || cov(j)(j) <= 0) None
        else Some(cov(i)(j) / (math.sqrt(cov(i)(i)) * math.sqrt(cov(j)(j))))
      (i.toLong, j.toLong, corr)
    }
    rows.toDF("i", "j", "corr")
      .select(col("i"), col("j"), round(col("corr"), 6).as("corr"))
  }
}
