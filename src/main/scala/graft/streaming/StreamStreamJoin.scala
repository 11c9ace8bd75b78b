package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Native watermarked stream-stream interval join — Spark's
  * StreamingSymmetricHashJoin, the one streaming join mechanism the
  * battery's mapGroupsWithState operators ([[StreamingAsOf]]) don't cover:
  * BOTH sides are unbounded streams, state on each side buffers only rows
  * whose event time can still find a partner, and the watermark + interval
  * condition is what lets Spark PROVE an eviction bound (view rows age out
  * `windowSec + delay` after the purchase watermark passes them).
  *
  * The attribution shape: every (view, purchase) pair of the same user
  * with the purchase inside [view_ts, view_ts + windowSec] — the
  * multi-touch attribution feed (q_linear_attribution's upstream, live).
  *
  * The SAME function runs on static frames (withWatermark is a no-op in
  * batch), which is the oracled batch twin — one plan text, two execution
  * regimes, the [[StreamingFunnel]] parity discipline.
  */
object StreamStreamJoin {

  /** `views(user_id, view_id, view_ts)` ⋈ `purchases(user_id, buy_id,
    * buy_ts)` within `windowSec`. Output `(user_id, view_id, buy_id,
    * lag_us)` — exact integer micros.
    */
  def attributed(
      views: DataFrame,
      purchases: DataFrame,
      windowSec: Long = 1800L,
      wmDelay: String = "10 minutes"
  ): DataFrame = {
    val v = views
      .select(col("user_id").as("v_user"), col("view_id"), col("view_ts"))
      .withWatermark("view_ts", wmDelay)
    val p = purchases
      .select(col("user_id").as("b_user"), col("buy_id"), col("buy_ts"))
      .withWatermark("buy_ts", wmDelay)
    v.join(p,
        col("v_user") === col("b_user") &&
          col("buy_ts") >= col("view_ts") &&
          col("buy_ts") <= col("view_ts") + expr(s"INTERVAL $windowSec SECONDS"))
      .select(
        col("v_user").as("user_id"), col("view_id"), col("buy_id"),
        (unix_micros(col("buy_ts")) - unix_micros(col("view_ts"))).as("lag_us"))
  }

  /** LEFT OUTER variant: every view emits — matched views with their
    * purchase(s), unmatched views with null (buy_id, lag_us) ONCE THE
    * WATERMARK PROVES no partner can still arrive (state eviction is the
    * emission trigger, so the null row lands a micro-batch after the
    * watermark passes view_ts + window + delay — the outer-join semantics
    * Spark only allows BECAUSE the interval condition bounds state). In
    * batch the same plan is a plain left outer join — the oracled twin.
    */
  def attributedOuter(
      views: DataFrame,
      purchases: DataFrame,
      windowSec: Long = 1800L,
      wmDelay: String = "10 minutes"
  ): DataFrame = {
    val v = views
      .select(col("user_id").as("v_user"), col("view_id"), col("view_ts"))
      .withWatermark("view_ts", wmDelay)
    val p = purchases
      .select(col("user_id").as("b_user"), col("buy_id"), col("buy_ts"))
      .withWatermark("buy_ts", wmDelay)
    v.join(p,
        col("v_user") === col("b_user") &&
          col("buy_ts") >= col("view_ts") &&
          col("buy_ts") <= col("view_ts") + expr(s"INTERVAL $windowSec SECONDS"),
        "leftOuter")
      .select(
        col("v_user").as("user_id"), col("view_id"), col("buy_id"),
        (unix_micros(col("buy_ts")) - unix_micros(col("view_ts"))).as("lag_us"))
  }
}
