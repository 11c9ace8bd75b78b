package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Session path mining — corpus counts of consecutive event-type TRIGRAMS
  * per user (the 3-gram extension of the Markov transition operator): the
  * navigation motifs ("view→click→purchase") a funnel report is built
  * from.
  *
  * Determinism: ordering is the exact micros axis with the event_id
  * tie-break (the established q_markov discipline); counts are exact
  * integers; `minCount` is an integer support filter.
  *
  * Scale: ONE exchange on user_id serves both lead windows; the trigram
  * rollup is map-side combinable on a tiny key space (|types|³).
  */
object Paths {

  /** (e1, e2, e3, n) — trigram counts with support ≥ minCount. */
  def eventTrigrams(events: DataFrame, minCount: Long = 10L): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    events
      .select(
        col("user_id"),
        col("event_type").as("e1"),
        expr("ts_ns DIV 1000").as("ts_us"),
        col("event_id"))
      .withColumn("e2", lead(col("e1"), 1).over(w))
      .withColumn("e3", lead(col("e1"), 2).over(w))
      .where(col("e2").isNotNull && col("e3").isNotNull)
      .groupBy("e1", "e2", "e3")
      .agg(count(lit(1)).as("n"))
      .where(col("n") >= minCount)
  }
}
