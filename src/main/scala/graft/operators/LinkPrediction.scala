package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Neighborhood-based link prediction over a bipartite interaction graph —
  * the classic trio of scores for "which item pairs are likely related":
  *
  *   - common neighbors:      cn(a,b)    = |Γ(a) ∩ Γ(b)|
  *   - Adamic–Adar:           aa(a,b)    = Σ_{u ∈ Γ(a)∩Γ(b)} 1 / ln(deg u)
  *   - resource allocation:   ra(a,b)    = Σ_{u ∈ Γ(a)∩Γ(b)} 1 / deg u
  *
  * (Adamic & Adar 2003; Zhou/Lü/Zhang 2009.) Items are linked through the
  * users that touched both; a shared user who touches EVERYTHING carries
  * almost no signal, which is exactly what the 1/ln(deg) and 1/deg
  * down-weights encode — the rare co-visitor dominates the score.
  *
  * Scale shape — identical to [[CoOccur]], which this extends: every
  * user's basket is first capped to `capPerUser` items by md5 rank
  * (deterministic skew cap; a bot user cannot go quadratic), then ONE
  * self-join co-partitioned on the user and ONE aggregate on the
  * canonical pair. Degrees are counted on the CAPPED interaction set so
  * the weights describe the same graph the pairs came from. No window
  * over pairs, no driver state.
  *
  * Exactness: both weights are per-user INTEGER micros —
  * `aa_u = floor(10⁶ / ln(deg_u))` (deg ≥ 2 for any shared user, so ln is
  * positive) and `ra_u = floor(10⁶ / deg_u)` (one IEEE double division of
  * exact integers, floored — bit-identical in every engine) — summed as
  * BIGINTs. The JVM and DuckDB agree on `floor(10⁶/ln(d))` for every
  * integer d (verified exhaustively to 500k; ln of an exact small integer
  * lands on the same double in both libms over this range), so the whole
  * score is hash-replayable with no doubles in any aggregate.
  */
object LinkPrediction {

  /** Item-pair link scores. Output: `item_a < item_b`, `cn` (common
    * neighbors), `aa_e6`, `ra_e6` (BIGINT micros), for pairs with
    * `cn >= minCommon`.
    */
  def itemScores(
      interactions: DataFrame,
      userCol: String,
      itemCol: String,
      capPerUser: Int = 20,
      minCommon: Long = 2L
  ): DataFrame = {
    // the SAME capped graph as the q_copurchase family — one shared
    // spelling (CoOccur.capped) so a cap-discipline change can never
    // leave this operator's graph diverging from the pair counts'
    val capped = CoOccur.capped(interactions, userCol, itemCol, capPerUser)
    // capped degree per user — the weight the pair aggregate folds in;
    // count(*) over the capped set, computed in the same window pass's
    // shuffle partitioning (one exchange on the user key total)
    val degged = capped.withColumn("deg",
      count(lit(1)).over(Window.partitionBy(col(userCol))))
    val a = degged.select(col(userCol), col(itemCol).as("item_a"), col("deg"))
    val b = degged.select(col(userCol), col(itemCol).as("item_b"))
    a.join(b, Seq(userCol))
      .filter(col("item_a") < col("item_b"))
      // deg >= 2 on any row that forms a pair (the user touched both
      // items), so ln(deg) > 0 by construction
      .select(col("item_a"), col("item_b"),
        floor(lit(1000000.0) / log(col("deg").cast("double"))).cast("long").as("_aa"),
        floor(lit(1000000.0) / col("deg").cast("double")).cast("long").as("_ra"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("cn"),
        sum(col("_aa")).as("aa_e6"),
        sum(col("_ra")).as("ra_e6"))
      .filter(col("cn") >= minCommon)
  }
}
