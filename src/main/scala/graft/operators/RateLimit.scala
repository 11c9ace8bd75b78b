package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Token-bucket admission control per key (the classic traffic-shaping
  * algorithm), in its batch-parity form: events replay in event-time
  * order and each key's bucket starts FULL, refills at `rateMicroPerSec`
  * micro-tokens per second of EVENT time (1 token = 10⁶ micro-tokens),
  * and admits an event iff ≥ 1 token is available — denied events do not
  * spend. The decision log is what a scrape/ingest pipeline persists to
  * audit burst suppression; because the clock is event time, a delayed
  * replay admits exactly the same events.
  *
  * Arithmetic contract (cross-engine exact): per-gap refill is
  * `min(Δts_us, dtCap) · rateMicroPerSec DIV 10⁶` — truncating division
  * on non-negative operands (Spark DIV ≡ DuckDB //), with the gap capped
  * at `dtCap` = the µs that fill an empty bucket (+1s pad), so the
  * multiply can never overflow however far apart two events sit.
  *
  * Scale shape: one shuffle on the key; each group streams through
  * `flatMapSortedGroups` (secondary sort — O(1) state per key, never a
  * per-key buffer): the distributed spelling of a genuinely sequential
  * recurrence (the HoltWinters class, per key instead of driver-side).
  */
object RateLimit {

  final case class Ev(user_id: Long, event_id: Long, ts_us: Long)
  final case class Decision(
      user_id: Long, event_id: Long, ts_us: Long,
      admitted: Boolean, tokens_after_micro: Long)

  private val Cost = 1000000L // one token per event, in micro-tokens

  /** @param events          (user_id, event_id, ts_us) rows.
    * @param capacityTokens  bucket size in whole tokens (≤ 10⁶).
    * @param rateMicroPerSec refill in micro-tokens per event-time second
    *                        (e.g. 1666 ≈ one token per 10 minutes).
    */
  def admit(
      events: DataFrame,
      capacityTokens: Long,
      rateMicroPerSec: Long): Dataset[Decision] = {
    require(capacityTokens >= 1 && capacityTokens <= 1000000L,
      s"capacityTokens=$capacityTokens out of range")
    require(rateMicroPerSec >= 0, "refill rate must be non-negative")
    val spark = events.sparkSession
    import spark.implicits._
    val cap = capacityTokens * Cost
    // µs to fill an empty bucket, +1s pad; caps the refill multiply so
    // (dt * rate) can never overflow for any event-time gap
    val dtCap =
      if (rateMicroPerSec == 0L) 0L
      else cap / rateMicroPerSec * 1000000L + 1000000L
    events
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("ts_us").cast("long"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapSortedGroups(col("ts_us"), col("event_id")) { (_, it) =>
        var tokens = cap
        var prevTs = Long.MinValue
        it.map { e =>
          val avail =
            if (prevTs == Long.MinValue) cap
            else {
              val dt = math.min(e.ts_us - prevTs, dtCap)
              math.min(cap, tokens + dt * rateMicroPerSec / 1000000L)
            }
          val admitted = avail >= Cost
          tokens = if (admitted) avail - Cost else avail
          prevTs = e.ts_us
          Decision(e.user_id, e.event_id, e.ts_us, admitted, tokens)
        }
      }
  }
}
