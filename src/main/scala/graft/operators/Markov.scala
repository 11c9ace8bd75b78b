package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order Markov transition matrix over per-key event sequences —
  * the behavioral model behind "what do users do after X" product
  * questions and the generative null model for session-anomaly scoring:
  * P(next = b | current = a) estimated as n(a→b) / Σ_c n(a→c).
  *
  * Scale shape: ONE exchange — the `lead` window partitions by key and
  * orders by (ts, tiebreak); the transition-pair aggregate and the
  * per-state totals are |states|²- and |states|-bounded tables. The
  * per-state total joins back onto the pair table (broadcast-scale by
  * construction: state alphabets are small even when event tables are
  * not). The final sequence element of each key emits no transition
  * (lead = null), matching the standard MLE estimator.
  *
  * Numeric discipline: counts are exact integers; the probability is one
  * division of exact integers, rounded to 6 on both engines.
  */
object Markov {

  /** @param tieCol unique tiebreak column so same-instant events order
    *               deterministically (the q_asof tie discipline).
    * @return (cur, next, n, n_from, p) — one row per observed transition.
    */
  def transitions(
      df: DataFrame,
      keyCol: String = "user_id",
      stateCol: String = "event_type",
      tsCol: String = "ts_us",
      tieCol: String = "event_id"
  ): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val pairs = df
      .select(col(keyCol), col(stateCol).as("cur"), col(tsCol), col(tieCol))
      .withColumn("next", lead(col("cur"), 1).over(w))
      .filter(col("next").isNotNull)
      .groupBy(col("cur"), col("next"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("cur")).agg(sum(col("n")).as("n_from"))
    pairs
      .join(totals, Seq("cur"))
      .withColumn("p", round(col("n").cast("double") / col("n_from"), 6))
      .select(col("cur"), col("next"), col("n"), col("n_from"), col("p"))
  }

  /** Per-state conditional entropy H(next | cur) in nats, from the output
    * of [[transitions]] — the chain's predictability profile: H → 0 means
    * the state's successor is deterministic (bot-like), high H means
    * diffuse behavior. Uses the EXACT n/n_from ratios (not the round-6
    * display probability), rounds the final sum to 6; the per-state term
    * count is |states|-bounded so the float sum is tiny and stable.
    */
  def stateEntropy(trans: DataFrame): DataFrame = {
    val p = col("n").cast("double") / col("n_from")
    trans
      .groupBy(col("cur"), col("n_from"))
      .agg(round(sum(-(p * log(p))), 6).as("entropy"))
      .select(col("cur"), col("n_from"), col("entropy"))
  }
}
