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

  /** Deterministic twin of [[balance]]: EXACTLY the minority-class count
    * kept from every class, membership ranked by md5(id) (the
    * [[graft.operators.GroupCap]] draw) instead of Bernoulli RNG — same
    * class-balancing semantics, but reproducible across runs/engines and
    * therefore DuckDB-oracle-able (q_balanced_deterministic), where the
    * seeded `sampleBy` can only ever get a rows-only check. No driver
    * round-trip either: the min class count rides in as a broadcast 1-row
    * frame instead of a collect.
    */
  def balanceDeterministic(
      df: DataFrame,
      labelCol: String = "label",
      idCol: String = "user_session"
  ): DataFrame = {
    val minN = df.groupBy(col(labelCol)).agg(count(lit(1)).as("_n"))
      .agg(min(col("_n")).as("_min_n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(labelCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("bal_rank", row_number().over(w).cast("long"))
      .crossJoin(broadcast(minN))
      .filter(col("bal_rank") <= col("_min_n"))
      .drop("_min_n")
  }

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
