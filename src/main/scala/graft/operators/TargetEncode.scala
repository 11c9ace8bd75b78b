package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Leave-one-out target encoding — the high-cardinality categorical
  * feature encoder (CatBoost / Kaggle lineage) with the leakage
  * correction built in: a row's own label is SUBTRACTED from its
  * category's statistics before the rate is formed,
  *
  *   loo_rate     = (Σy − y) / (n − 1)                  (null when n = 1)
  *   loo_smoothed = (Σy − y + m·prior) / (n − 1 + m)    (prior = global mean)
  *
  * so the encoding of a training row never contains that row's target —
  * the mistake plain mean-encoding makes and the exact analogue of the
  * W1 leakage rule the reference's preprocessing enforces for session
  * features (`src/batch/preprocessing.py` first-purchase guard).
  *
  * Scale shape: one `groupBy(keys)` aggregate (n, Σy — bounded by category
  * cardinality), joined back WITHOUT a broadcast hint: AQE broadcasts it
  * when the category table actually fits and falls back to a shuffle join
  * co-partitioned on the keys when it does not (the [[TfIdf]] df-join
  * discipline — never hint-broadcast an unbounded vocabulary). The global
  * prior is a one-row bounded driver probe.
  *
  * Numeric discipline: with an integer-valued label (the 0/1 conversion
  * case) n and Σy are exact integers, so every derived rate is identical
  * IEEE arithmetic on both engines. Float labels would make Σy
  * partition-order-dependent — fixed-point-scale them first (the
  * [[StratifiedSample]] cents discipline).
  */
object TargetEncode {

  /** @param labelCol integer-valued numeric column (see scaladoc).
    * @return input rows + (te_n, te_sum, loo_rate, loo_smoothed).
    */
  def leaveOneOut(
      df: DataFrame,
      keyCols: Seq[String],
      labelCol: String,
      smoothing: Double = 10.0
  ): DataFrame = {
    val g = df
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("te_n"), sum(col(labelCol)).cast("long").as("te_sum"))
    val Seq(totN, totS) = df
      .agg(count(lit(1)), sum(col(labelCol)).cast("long")).head().toSeq
      .map(v => Option(v).fold(0L)(_.asInstanceOf[Number].longValue))
    require(totN > 0, "TargetEncode.leaveOneOut: empty input")
    val prior = totS.toDouble / totN

    // floor(x·10⁶ + 0.5) rounding, not round(): these rates are exact
    // small-denominator rationals that DO land on decimal half-boundaries
    // (a real sf0.1 red cell at prior = 0.20084 → smoothed = 0.1250875),
    // where the engines' round() implementations disagree.
    def floor6(c: Column): Column = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    val diff = col("te_sum") - col(labelCol)
    df.join(g, keyCols)
      .withColumn("loo_rate",
        when(col("te_n") > 1,
          floor6(diff.cast("double") / (col("te_n") - 1))))
      .withColumn("loo_smoothed",
        floor6((diff + lit(smoothing) * lit(prior)) /
          (col("te_n") - 1 + lit(smoothing))))
  }
}
