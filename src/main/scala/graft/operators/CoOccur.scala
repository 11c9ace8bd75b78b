package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Capped item co-occurrence — the market-basket / co-click primitive:
  * count, for every unordered item pair, how many users interacted with
  * both. The naive per-user self-join is quadratic in basket size, and at
  * corpus scale a single bot user with 10⁵ items would emit 5·10⁹ pairs;
  * here every user first keeps at most `capPerUser` items, chosen by md5
  * rank so the draw is deterministic and engine-reproducible (same
  * hot-key bound as Dedup's bucket caps — skew is capped by construction,
  * not by hope).
  *
  * Shape: one shuffle on the user key for the cap window, one self-join
  * co-partitioned on the user, one aggregate on the pair. Pairs are
  * canonical (item_a < item_b).
  */
object CoOccur {

  /** Distinct (user, item) interactions with each user's basket capped to
    * `capPerUser` md5-ranked items — the shared prefix of [[pairs]] and
    * [[BasketRules.rules]] (supports and pair counts must describe the
    * SAME capped graph).
    */
  def capped(
      interactions: DataFrame,
      userCol: String,
      itemCol: String,
      capPerUser: Int
  ): DataFrame = {
    require(capPerUser >= 2, "capPerUser must be at least 2")
    interactions.select(col(userCol), col(itemCol)).distinct()
      .withColumn("_r", row_number().over(
        Window.partitionBy(col(userCol))
          .orderBy(HashSplit.md548(col(itemCol)), col(itemCol))))
      .filter(col("_r") <= capPerUser)
      .drop("_r")
  }

  def pairs(
      interactions: DataFrame,
      userCol: String,
      itemCol: String,
      capPerUser: Int = 20,
      minCount: Long = 2L
  ): DataFrame = {
    val capped = this.capped(interactions, userCol, itemCol, capPerUser)
    val a = capped.select(col(userCol), col(itemCol).as("item_a"))
    val b = capped.select(col(userCol), col(itemCol).as("item_b"))
    a.join(b, Seq(userCol))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_users"))
      .filter(col("n_users") >= minCount)
  }
}
