package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Association rules over the capped basket graph (Agrawal & Srikant
  * 1994's support/confidence plus lift — the Apriori k=2 tier, which is
  * the tier that survives at corpus scale): for every co-occurring item
  * pair,
  *
  *   support    = n_ab / N           (fraction of users with both)
  *   confidence = n_ab / n_a         (a→b and b→a both reported)
  *   lift       = n_ab·N / (n_a·n_b) (>1 ⇒ genuinely associated)
  *
  * computed on the SAME md5-capped interaction set as [[CoOccur.pairs]]
  * — supports and pair counts must describe one graph, or a hot user
  * capped out of the pairs would still inflate the marginals.
  *
  * Exactness: ratios are floored e6 micros of exact BIGINT counts;
  * lift is one left-associated double chain `n_ab·N / n_a / n_b · 10⁶`
  * (each product of exact integers < 2⁵³ — holds to ~10⁹ users per pair
  * count, documented bound), spelled identically in the oracle.
  *
  * Scale: the cap window + self-join + pair aggregate are CoOccur's; the
  * supports are one more aggregate on the capped frame; the 1-row user
  * count broadcasts.
  */
object BasketRules {

  /** Canonical-pair rules: `item_a < item_b`, both directions'
    * confidences. Output: `item_a`, `item_b`, `n_ab`, `n_a`, `n_b`,
    * `support_e6`, `conf_ab_e6`, `conf_ba_e6`, `lift_e6`.
    */
  def rules(
      interactions: DataFrame,
      userCol: String,
      itemCol: String,
      capPerUser: Int = 20,
      minCount: Long = 2L
  ): DataFrame = {
    val capped = CoOccur.capped(interactions, userCol, itemCol, capPerUser)
    val supports = capped.groupBy(col(itemCol)).agg(count(lit(1)).as("n_item"))
    val nUsers = capped.agg(countDistinct(col(userCol)).as("n_users"))
    val a = capped.select(col(userCol), col(itemCol).as("item_a"))
    val b = capped.select(col(userCol), col(itemCol).as("item_b"))
    val pairs = a.join(b, Seq(userCol))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
    pairs
      .join(supports.select(col(itemCol).as("item_a"), col("n_item").as("n_a")),
        Seq("item_a"))
      .join(supports.select(col(itemCol).as("item_b"), col("n_item").as("n_b")),
        Seq("item_b"))
      .crossJoin(broadcast(nUsers))
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"), col("n_b"),
        floor(col("n_ab").cast("double") * lit(1000000.0) / col("n_users"))
          .cast("long").as("support_e6"),
        floor(col("n_ab").cast("double") * lit(1000000.0) / col("n_a"))
          .cast("long").as("conf_ab_e6"),
        floor(col("n_ab").cast("double") * lit(1000000.0) / col("n_b"))
          .cast("long").as("conf_ba_e6"),
        floor(col("n_ab").cast("double") * col("n_users") / col("n_a") / col("n_b")
          * lit(1000000.0)).cast("long").as("lift_e6"))
  }
}
