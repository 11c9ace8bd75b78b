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

  /** Stationary distribution π (πP = π) and entropy RATE of the chain —
    * the long-run fraction of time spent in each state and the per-step
    * information production Σᵢ πᵢ·H(next|i), the single-number
    * "predictability of the whole behavior stream" that complements the
    * per-state profile of [[stateEntropy]].
    *
    * Determinism contract (the [[graft.operators.Pca]] replay pattern):
    * the |states|² exact-integer transition counts are a bounded driver
    * probe; π comes from a FIXED `iters` of power iteration from the
    * uniform start with L1 renormalization each round, every float op an
    * ascending-index left fold the generated DuckDB oracle replays
    * term-for-term. Output floats use the floor(x·10⁶+0.5)/10⁶ spelling
    * (arithmetic-derived values — library round() is not cross-engine
    * safe on them).
    *
    * The state alphabet is the operator's CONTRACT (like funnel steps):
    * transitions touching a state outside `states` are excluded from the
    * counts on both engines. A state with no outgoing transitions gets a
    * self-loop row (the standard absorbing-state completion).
    *
    * Scale shape: everything distributed is [[transitions]] (one window
    * exchange); the driver math is O(|states|²·iters) on a ≤alphabet²
    * matrix — microseconds, like the PCA eigensolve.
    */
  def stationary(
      trans: DataFrame,
      states: Seq[String],
      iters: Int = 12
  ): DataFrame = {
    require(states.nonEmpty, "Markov.stationary: empty state alphabet")
    val spark = trans.sparkSession
    import spark.implicits._
    val k = states.length
    val idx = states.zipWithIndex.toMap
    // bounded driver probe: at most |observed states|² exact counts
    val nMat = Array.ofDim[Long](k, k)
    trans.select(col("cur"), col("next"), col("n"))
      .as[(String, String, Long)].collect()
      .foreach { case (c, x, n) =>
        for { i <- idx.get(c); j <- idx.get(x) } nMat(i)(j) += n
      }
    val nFrom: Array[Long] = nMat.map(_.sum)
    val p = Array.tabulate(k, k) { (i, j) =>
      if (nFrom(i) == 0L) { if (i == j) 1.0 else 0.0 }
      else nMat(i)(j).toDouble / nFrom(i)
    }
    // fixed-iteration power method, ascending-index folds throughout —
    // exactly the arithmetic the generated oracle unrolls
    var pi = Array.fill(k)(1.0 / k)
    var t = 0
    while (t < iters) {
      val next = Array.tabulate(k) { j =>
        var acc = 0.0; var i = 0
        while (i < k) { acc += pi(i) * p(i)(j); i += 1 }
        acc
      }
      var s = 0.0; var j = 0
      while (j < k) { s += next(j); j += 1 }
      pi = next.map(_ / s)
      t += 1
    }
    // H(next|i): zero-count cells contribute an exact 0.0 so the fold
    // order is the plain ascending-j chain the oracle spells out
    val h = Array.tabulate(k) { i =>
      var acc = 0.0; var j = 0
      while (j < k) {
        val pij = p(i)(j)
        acc += (if (nMat(i)(j) > 0L) -(pij * math.log(pij)) else 0.0)
        j += 1
      }
      acc
    }
    var rate = 0.0
    var ri = 0
    while (ri < k) { rate += pi(ri) * h(ri); ri += 1 }
    def floor6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    states.zipWithIndex
      .map { case (st, i) => (st, floor6(pi(i)), floor6(h(i)), floor6(rate)) }
      .toDF("state", "pi", "h_state", "entropy_rate")
  }
}

