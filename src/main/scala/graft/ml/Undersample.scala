package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** U1–U3: random undersampling to ≈1:1 class balance
  * (reference: src/spark/train_intent.py:51-79).
  *
  * The sampling fraction is data-dependent: two count() actions must return
  * before the sample transform exists. That driver round-trip is intrinsic to
  * the semantics (SURVEY §3.2) — two cheap count-only jobs (column-pruned
  * scans), then one Bernoulli sample with no shuffle at all.
  */
object Undersample {

  def balance(df: DataFrame, labelCol: String = "label", seed: Long = 42L): DataFrame = {
    val minority = df.filter(col(labelCol) === 1)
    val majority = df.filter(col(labelCol) === 0)
    val minorityCount = minority.count()
    val majorityCount = majority.count()
    if (majorityCount <= minorityCount || minorityCount == 0L) df
    else {
      val fraction = minorityCount.toDouble / majorityCount
      minority.union(majority.sample(withReplacement = false, fraction, seed))
    }
  }
}
