package graft.ml

import org.apache.spark.ml.recommendation.{ALS, ALSModel}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** M8: implicit-feedback ALS recommender, confidence c_ui = 1 + α·r_ui
  * (reference: report/Progress_report.pdf §3.2 — code absent from the repo,
  * only the formulation and Recall@10 numbers are published).
  */
object Recommender {

  /** Build (user, item, rating) implicit interactions from a clickstream:
    * rating = event count weighted by type (purchase > cart > view).
    */
  def interactions(
      clickstream: DataFrame,
      userCol: String = "user_session",
      itemCol: String = "product_id",
      typeCol: String = "event_type"
  ): DataFrame =
    clickstream
      .select(
        col(userCol).cast("int").as("user"),
        col(itemCol).cast("int").as("item"),
        when(col(typeCol) === "purchase", 5.0)
          .when(col(typeCol) === "cart", 3.0)
          .otherwise(1.0)
          .as("w")
      )
      .filter(col("user").isNotNull && col("item").isNotNull)
      .groupBy(col("user"), col("item"))
      .agg(sum(col("w")).cast("float").as("rating"))

  def train(
      interactions: DataFrame,
      rank: Int = 10,
      alpha: Double = 40.0,
      regParam: Double = 0.1,
      maxIter: Int = 10,
      seed: Long = 42L
  ): ALSModel =
    new ALS()
      .setImplicitPrefs(true)
      .setAlpha(alpha)
      .setRank(rank)
      .setRegParam(regParam)
      .setMaxIter(maxIter)
      .setSeed(seed)
      .setUserCol("user")
      .setItemCol("item")
      .setRatingCol("rating")
      .setColdStartStrategy("drop")
      .fit(interactions)

  def recommend(model: ALSModel, k: Int = 10): DataFrame =
    model.recommendForAllUsers(k)

  /** Recall@k against held-out positives: |recommended ∩ held-out| / |held-out|,
    * averaged over users with ≥1 held-out item.
    */
  def recallAtK(model: ALSModel, heldOut: DataFrame, k: Int = 10): Double = {
    val recs = recommend(model, k)
      .select(col("user"), explode(col("recommendations.item")).as("item"))
    val hits = recs.join(heldOut.select("user", "item"), Seq("user", "item"))
    val perUser = heldOut
      .groupBy("user")
      .agg(count(lit(1)).as("n_held"))
      .join(hits.groupBy("user").agg(count(lit(1)).as("n_hit")), Seq("user"), "left")
      .na
      .fill(0, Seq("n_hit"))
      .select(avg(col("n_hit").cast("double") / col("n_held")).as("recall"))
    val r = perUser.collect()(0).getDouble(0)
    r
  }
}
