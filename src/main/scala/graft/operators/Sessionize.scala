package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Leakage-free sessionization: attach each session's first-purchase
  * timestamp to every event row, then cut events after it.
  *
  * Two equivalent spellings (reference computes both and they must agree):
  *   - W1: partition window `min(when(purchase, ts)).over(partitionBy(session))`
  *     (reference: src/spark/preprocessing.py:49-56)
  *   - J1: `groupBy(session).min(purchase ts)` + left join back
  *     (reference: src/pandas/pandas_baseline.py:63-68)
  *
  * Scale note: W1 is one shuffle on the session key and Catalyst reuses that
  * partitioning for the downstream session aggregate (no second exchange).
  * J1 shuffles both sides of the join on the same key — strictly more work at
  * 100 TB unless the first-purchase side is small enough to broadcast. Prefer
  * W1; keep J1 for the equivalence test.
  */
object Sessionize {

  /** W1: add `purchase_timestamp` (null for never-purchasing sessions). */
  def withFirstPurchase(
      df: DataFrame,
      sessionCol: String = "user_session",
      typeCol: String = "event_type",
      tsCol: String = "event_time",
      purchaseType: String = "purchase"
  ): DataFrame = {
    val w = Window.partitionBy(col(sessionCol))
    df.withColumn(
      "purchase_timestamp",
      min(when(col(typeCol) === purchaseType, col(tsCol))).over(w)
    )
  }

  /** J1: same result via aggregate + left equi-join. */
  def withFirstPurchaseViaJoin(
      df: DataFrame,
      sessionCol: String = "user_session",
      typeCol: String = "event_type",
      tsCol: String = "event_time",
      purchaseType: String = "purchase"
  ): DataFrame = {
    val firstPurchase = df
      .filter(col(typeCol) === purchaseType)
      .groupBy(col(sessionCol))
      .agg(min(col(tsCol)).as("purchase_timestamp"))
    df.join(firstPurchase, Seq(sessionCol), "left")
  }

  /** P4: null-safe temporal cut — keep pre-purchase rows (and the purchase
    * event itself); sessions with no purchase keep everything.
    * (reference: src/spark/preprocessing.py:58-61)
    */
  def dropLeakage(
      df: DataFrame,
      tsCol: String = "event_time",
      purchaseTsCol: String = "purchase_timestamp"
  ): DataFrame =
    df.filter(col(purchaseTsCol).isNull || col(tsCol) <= col(purchaseTsCol))

  /** Gap-based sessionization (beyond the reference, which only groups by a
    * pre-assigned session key — SURVEY §2.9 note): a new session starts when
    * the gap to the previous event of the same user exceeds `gapSeconds`.
    * Classic lag + running-sum spelling: one shuffle on the user key, both
    * windows share its partitioning. Adds `session_idx` (1-based per user)
    * and `session_id`.
    *
    * The streaming twin with explicit state lives in
    * streaming.GapSessionizer (flatMapGroupsWithState).
    */
  def gapSessions(
      df: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      gapSeconds: Long = 1800L,
      tieBreakCol: Option[String] = None
  ): DataFrame = {
    val orderCols = col(tsCol) +: tieBreakCol.map(col).toSeq
    val w = Window.partitionBy(col(userCol)).orderBy(orderCols: _*)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tsS = col(tsCol).cast("long")
    df.withColumn("_prev_ts", lag(tsS, 1).over(w))
      .withColumn(
        "_new_session",
        when(col("_prev_ts").isNull || tsS - col("_prev_ts") > gapSeconds, 1).otherwise(0)
      )
      .withColumn("session_idx", sum(col("_new_session")).over(run))
      .withColumn("session_id", concat(col(userCol).cast("string"), lit("_"), col("session_idx")))
      .drop("_prev_ts", "_new_session")
  }
}
