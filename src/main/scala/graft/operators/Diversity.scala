package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Behavioral-diversity rollup — the Herfindahl–Hirschman index of each
  * user's event-type mix (HHI = Σᵢ (cᵢ/T)² ∈ (0,1]; 1 = single-typed,
  * 1/k = uniform over k types), bucketed into deciles for a corpus-level
  * distribution report.
  *
  * Determinism: HHI = Σcᵢ² / T² is ONE double division of two exact
  * integers (never a float sum of per-type shares), so the decile
  * `floor(hhi·10)` lands identically in both engines even exactly on a
  * bucket boundary; all report columns are integers.
  *
  * Scale: two map-side-combinable aggregations ((user, type) then user),
  * then a 11-row rollup — no sort, no window, no skew exposure beyond the
  * user key itself.
  */
object Diversity {

  /** (bucket, n_users, n_events) — decile bucket of per-user HHI
    * (bucket 10 = exactly single-typed users).
    */
  def hhiBuckets(events: DataFrame): DataFrame = {
    val ct = events.groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
    val per = ct
      .groupBy("user_id")
      .agg(sum(col("c") * col("c")).as("ss"), sum(col("c")).as("t"))
    per
      .withColumn(
        "hhi",
        col("ss").cast("double") / (col("t") * col("t")).cast("double"))
      .groupBy(floor(col("hhi") * lit(10.0d)).as("bucket"))
      .agg(count(lit(1)).as("n_users"), sum(col("t")).as("n_events"))
  }
}
