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

  /** (level, n_coeffs, energy) for levels 1..levels.
    *
    * Each level's paired frame feeds TWO consumers (its own energy
    * aggregate and the next level's approximation), and the dense grid
    * feeds level 1 — without caching, the lazy union re-derived the whole
    * hourly rollup once per level branch (~2·levels fact-table scans).
    * The per-level stats are a bounded driver object (levels rows of 3
    * longs), so we materialize them eagerly, unpersist every cached frame,
    * and hand back a local DataFrame — the fact table is scanned exactly
    * once.
    */
  def hourlyEnergy(events: DataFrame, levels: Int = 4): DataFrame = {
    val spark = events.sparkSession
    val hourly = events
      .groupBy(expr("CAST(ts AS LONG) DIV 3600").as("h"))
      .agg(count(lit(1)).as("c"))
      .persist()
    val dense = hourly
      .agg(min("h").as("h0"), max("h").as("h1"))
      .select(col("h0"), explode(sequence(col("h0"), col("h1"))).as("h"))
      .join(hourly, Seq("h"), "left")
      .select((col("h") - col("h0")).as("t"), coalesce(col("c"), lit(0L)).as("a"))
    var approx = dense
    val cached = scala.collection.mutable.Buffer[DataFrame](hourly)
    val rows = (1 to levels).map { lvl =>
      val paired = approx
        .groupBy(expr("t DIV 2").as("tp"))
        .agg(
          count(lit(1)).as("np"),
          sum(when(expr("t % 2 = 0"), col("a")).otherwise(0L)).as("even"),
          sum(when(expr("t % 2 = 1"), col("a")).otherwise(0L)).as("odd"))
        .where(col("np") === 2)
        .persist()
      cached += paired
      val r = paired
        .agg(
          count(lit(1)).as("n_coeffs"),
          sum((col("even") - col("odd")) * (col("even") - col("odd"))).as("energy"))
        .head()
      approx = paired.select(col("tp").as("t"), (col("even") + col("odd")).as("a"))
      // energy is null for an empty level (sum over zero rows), same as the
      // lazy spelling produced
      (lvl.toLong, r.getLong(0),
        if (r.isNullAt(1)) null.asInstanceOf[java.lang.Long]
        else java.lang.Long.valueOf(r.getLong(1)))
    }
    // The last level's paired frame was materialized by its own head();
    // every cached block is now consumed.
    cached.foreach(_.unpersist(blocking = false))
    import spark.implicits._
    rows.toDF("level", "n_coeffs", "energy")
  }
}
