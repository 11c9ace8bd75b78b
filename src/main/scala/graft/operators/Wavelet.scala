package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Haar wavelet energy decomposition of the hourly event-count series —
  * which time scales carry the traffic's variation: level-ℓ detail
  * coefficients are pairwise differences of level-(ℓ−1) approximations
  * (UNNORMALIZED Haar, so every coefficient stays an exact integer), and
  * the reported energy is Σ d² per level. Diurnal traffic concentrates
  * energy at the matching scales; white noise spreads it flat.
  *
  * Determinism: the dense zero-filled grid is integer counts indexed from
  * the corpus' first hour; pairing is integer index arithmetic
  * (incomplete tail pairs DROP — both engines see the same absence);
  * approximations are integer pair-sums, details integer
  * pair-differences, energies exact BIGINT sums of squares.
  *
  * Scale: the rollup is map-side combined; the series (hours) is tiny, so
  * the log₂-depth pair cascade is a bounded post-rollup step.
  */
object Wavelet {

  /** (level, n_coeffs, energy) for levels 1..levels. */
  def hourlyEnergy(events: DataFrame, levels: Int = 4): DataFrame = {
    val hourly = events
      .groupBy(expr("CAST(ts AS LONG) DIV 3600").as("h"))
      .agg(count(lit(1)).as("c"))
    val dense = hourly
      .agg(min("h").as("h0"), max("h").as("h1"))
      .select(col("h0"), explode(sequence(col("h0"), col("h1"))).as("h"))
      .join(hourly, Seq("h"), "left")
      .select((col("h") - col("h0")).as("t"), coalesce(col("c"), lit(0L)).as("a"))
    var approx = dense
    val perLevel = (1 to levels).map { lvl =>
      val paired = approx
        .groupBy(expr("t DIV 2").as("tp"))
        .agg(
          count(lit(1)).as("np"),
          sum(when(expr("t % 2 = 0"), col("a")).otherwise(0L)).as("even"),
          sum(when(expr("t % 2 = 1"), col("a")).otherwise(0L)).as("odd"))
        .where(col("np") === 2)
      val stats = paired
        .agg(
          count(lit(1)).as("n_coeffs"),
          sum((col("even") - col("odd")) * (col("even") - col("odd"))).as("energy"))
        .select(lit(lvl.toLong).as("level"), col("n_coeffs"), col("energy"))
      approx = paired.select(col("tp").as("t"), (col("even") + col("odd")).as("a"))
      stats
    }
    perLevel.reduce(_.union(_))
  }
}
