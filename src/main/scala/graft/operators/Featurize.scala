package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-name mapping for the session-feature aggregate, so the same
  * operator runs on the reference clickstream shape and on the synthetic
  * `events` table.
  */
final case class SessionConf(
    sessionCol: String = "user_session",
    typeCol: String = "event_type",
    tsCol: String = "event_time",
    priceCol: String = "price",
    itemCol: String = "product_id",
    viewType: String = "view",
    cartType: String = "cart",
    purchaseType: String = "purchase"
)

/** A1: the core per-session feature aggregate
  * (reference: src/spark/preprocessing.py:81-100).
  *
  * One hash aggregate, partial + final, keyed on the session column. When it
  * runs after [[Sessionize.withFirstPurchase]] the input is already
  * hash-partitioned on the same key, so Catalyst elides the exchange — the
  * whole sessionize→featurize pipeline is a single shuffle. That property is
  * what makes this viable at 100 TB; verify in the plan (one Exchange).
  *
  * `count(when(cond, 1))` counts only matching rows (the else-branch NULL is
  * ignored) — oracle SQL must spell it `COUNT(CASE WHEN cond THEN 1 END)`.
  *
  * `session_duration` uses real parsed timestamps (seconds). The reference's
  * batch plane silently collapses this to 0 by casting an unparsed string
  * (SURVEY §1.2 quirk); we implement the intended semantics, which its pandas
  * and streaming planes both compute (src/pandas/pandas_baseline.py:92,
  * src/streaming/stream_processor.py:184-187).
  */
object Featurize {

  def sessionFeatures(df: DataFrame, c: SessionConf = SessionConf()): DataFrame = {
    val s = col(c.sessionCol)
    df.groupBy(s)
      .agg(
        max(when(col("purchase_timestamp").isNotNull, 1).otherwise(0)).as("label"),
        count(when(col(c.typeCol) === c.viewType, 1)).as("view_count"),
        count(when(col(c.typeCol) === c.cartType, 1)).as("cart_count"),
        (max(col(c.tsCol)).cast("long") - min(col(c.tsCol)).cast("long"))
          .as("session_duration"),
        avg(col(c.priceCol)).as("avg_price"),
        max(col(c.priceCol)).as("max_price"),
        countDistinct(col(c.itemCol)).as("unique_items")
      )
      .na
      .fill(0)
  }

  /** The full leakage-free pipeline: W1 → P4 → A1 (reference:
    * src/spark/preprocessing.py run_preprocessing). Input: raw clickstream.
    */
  def leakageFreeSessionFeatures(df: DataFrame, c: SessionConf = SessionConf()): DataFrame = {
    val withP = Sessionize.withFirstPurchase(df, c.sessionCol, c.typeCol, c.tsCol, c.purchaseType)
    val cut = Sessionize.dropLeakage(withP, c.tsCol)
    sessionFeatures(cut, c)
  }

  /** A7: micro-batch scalar totals + guarded conversion rate
    * (reference: src/streaming/stream_processor.py:239-246) — done in Spark,
    * not collected to the driver.
    */
  def batchTotals(df: DataFrame, c: SessionConf = SessionConf()): DataFrame = {
    def cnt(t: String): Column = count(when(col(c.typeCol) === t, 1))
    df.agg(
        cnt(c.viewType).as("total_views"),
        cnt(c.cartType).as("total_carts"),
        cnt(c.purchaseType).as("total_purchases"),
        count(lit(1)).as("total_events"),
        countDistinct(col(c.sessionCol)).as("active_sessions")
      )
      .withColumn(
        "conversion_rate",
        when(col("total_carts") === 0, lit(0.0))
          .otherwise(col("total_purchases").cast("double") / col("total_carts") * 100.0)
      )
  }
}
