package graft.ml

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** M7: deterministic rule-ladder purchase-intent predictor
  * (reference: src/streaming/online_model.py:313-322).
  */
object Heuristic {
  def score(cartCount: Column, viewCount: Column): Column =
    when(cartCount >= 3, 0.85)
      .when(cartCount >= 1, 0.60)
      .when(viewCount >= 10, 0.35)
      .when(viewCount >= 5, 0.20)
      .otherwise(0.05)

  /** Dashboard-style intent bucketing (reference: dashboard/app.py:311-354). */
  def intentBucket(probability: Column): Column =
    when(probability > 0.7, "high")
      .when(probability > 0.4, "medium")
      .otherwise("low")
}
