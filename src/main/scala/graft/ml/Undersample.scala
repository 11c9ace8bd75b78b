package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** U1–U3: random undersampling to ≈1:1 class balance
  * (reference: src/spark/train_intent.py:51-79).
  *
  * The sampling fraction is data-dependent: a count action must return
  * before the sample transform exists — that driver round-trip is intrinsic
  * to the semantics (SURVEY §3.2). The reference spells it as two filtered
  * counts + filter/sample/union (4 passes over the lineage); one
  * groupBy-count plus one stratified `sampleBy` computes the identical
  * Bernoulli-per-stratum result in 2 passes.
  */
object Undersample {

  def balance(df: DataFrame, labelCol: String = "label", seed: Long = 42L): DataFrame = {
    val counts = df
      .groupBy(col(labelCol).cast("int").as("l"))
      .count()
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    val minorityCount = counts.getOrElse(1, 0L)
    val majorityCount = counts.getOrElse(0, 0L)
    if (majorityCount <= minorityCount || minorityCount == 0L) df
    else {
      val fraction = minorityCount.toDouble / majorityCount
      df.stat.sampleBy(col(labelCol).cast("int"), Map(1 -> 1.0, 0 -> fraction), seed)
    }
  }
}
