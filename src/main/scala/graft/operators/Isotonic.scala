package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Isotonic (PAV) probability calibration over a TIERED score — the
  * other classic calibrator next to the ECE report (q_calibration):
  * monotone-nondecreasing calibrated rates per score tier, the
  * pool-adjacent-violators fit.
  *
  * Replay discipline: instead of the sequential PAV merge loop, the fit
  * uses the equivalent MINIMAX closed form (PAV ≡ isotonic regression):
  *
  *   rate_k = max_{i ≤ k} min_{j ≥ k} avg(i..j),
  *   avg(i..j) = Σpos[i..j] / Σn[i..j]
  *
  * which is pure relational algebra over the tier table: exact-integer
  * range sums from prefix arrays, ONE double division per range with a
  * fixed spelling, and min/max (order-free, exact — never a float SUM)
  * over the bounded range enumeration. Output rates floor-6 quantized.
  *
  * Scale contract: runs over the DISTINCT-SCORE tier table (bounded by
  * construction — bucketed or laddered scores, never raw floats), so the
  * O(B³) minimax enumeration and the tiny rank window are constant-cost;
  * the only corpus-scale step is the one tier aggregation.
  */
object Isotonic {

  /** `(score_micros, n, pos, raw_rate_micros, iso_rate_micros)` per
    * distinct score, iso rates monotone in score.
    *
    * `maxTiers` makes the tiered-score contract LOUD (the RangeJoin
    * bucket-cap precedent): feeding raw continuous scores would silently
    * cube the tier count into the minimax enumeration, so tier
    * `maxTiers + 1`, if it exists, raises instead of exploding.
    */
  def calibrate(df: DataFrame, scoreCol: String, labelCol: String,
      maxTiers: Int = 200): DataFrame = {
    require(maxTiers >= 1, "maxTiers must be positive")
    val tiers = df.groupBy(col(scoreCol).cast("long").as("s"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(labelCol) === 1, 1L).otherwise(0L)).as("pos"))
    // bounded by contract: the window ranks the tier table; the guard
    // rides on k itself so column pruning can never elide it
    val ranked = tiers
      .withColumn("k", row_number().over(Window.orderBy(col("s"))))
      .withColumn("k",
        when(col("k") > maxTiers, raise_error(concat(
          lit(s"Isotonic.calibrate: more than $maxTiers distinct scores — " +
            "bucket or ladder the score first (tier "),
          col("k").cast("string"), lit(")"))))
          .otherwise(col("k")))
    val pre = ranked.select(col("k"), col("s"), col("n"), col("pos"))
    val a = pre.select(col("k").as("i"), col("n").as("ni"), col("pos").as("pi"))
    val b = pre.select(col("k").as("j"))
    // exact range sums via a bounded self-join (B² ranges × B members)
    val ranges = a.crossJoin(b).filter(col("i") <= col("j"))
      .join(pre.select(col("k").as("m"), col("n").as("nm"), col("pos").as("pm")),
        col("m").between(col("i"), col("j")))
      .groupBy(col("i"), col("j"))
      .agg(sum(col("nm")).as("rn"), sum(col("pm")).as("rp"))
      .select(col("i"), col("j"),
        (col("rp").cast("double") / col("rn").cast("double")).as("avgd"))
    val ks = pre.select(col("k"))
    val inner = ranges.join(ks, col("i") <= col("k") && col("j") >= col("k"))
      .groupBy(col("i"), col("k")).agg(min(col("avgd")).as("mn"))
    val iso = inner.groupBy(col("k")).agg(max(col("mn")).as("rate"))
    pre.join(iso, Seq("k"))
      .select(col("s").as("score_micros"), col("n"), col("pos"),
        expr("pos * 1000000 DIV n").as("raw_rate_micros"),
        floor(col("rate") * lit(1000000.0d) + lit(0.5d)).cast("long")
          .as("iso_rate_micros"))
  }
}
