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

  /** The same ladder as integer micros — the spelling the deterministic
    * evaluation queries (PRF / calibration / gains) rank and bucket on, so
    * no double literal ever crosses an engine boundary.
    */
  def scoreMicros(cartCount: Column, viewCount: Column): Column =
    when(cartCount >= 3, 850000L)
      .when(cartCount >= 1, 600000L)
      .when(viewCount >= 10, 350000L)
      .when(viewCount >= 5, 200000L)
      .otherwise(50000L)

  /** Dashboard-style intent bucketing (reference: dashboard/app.py:311-354). */
  def intentBucket(probability: Column): Column =
    when(probability > 0.7, "high")
      .when(probability > 0.4, "medium")
      .otherwise("low")
}
