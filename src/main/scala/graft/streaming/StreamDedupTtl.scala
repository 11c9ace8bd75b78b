package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}
import org.apache.spark.sql.streaming.ValueState

/** Streaming exact-dedup with state TTL — the infinite-stream shape of
  * [[graft.operators.Dedup]]'s first-seen dropper: a key is admitted the
  * FIRST time it appears, suppressed while its state lives, and
  * RE-ADMITTED once it has been idle ≥ ttl (the state evicts by wall
  * clock under `TTLConfig`, so state size is O(keys seen within one TTL
  * window) forever — the property that makes exact dedup viable on an
  * unbounded stream, where the TTL-less spelling grows without bound).
  * Every sighting refreshes the TTL (sliding idle window — the
  * Bloom-with-TTL convention).
  *
  * Deterministic admission: when a key's state is absent and the group
  * carries several rows (one micro-batch, or the whole input in a batch
  * run), the row with the SMALLEST payload is admitted — an order-free
  * fold, so the batch emission equals `min(payload) GROUP BY key` exactly
  * and the operator is driver-gated through its batch run
  * (q_stream_dedup_ttl, the q_stream_bottomk pattern; TTL never lapses
  * inside one batch). The spec drives the genuinely streaming path:
  * suppression across batches, then TTL re-admission, on RocksDB.
  */
object StreamDedupTtl {

  final case class Rec(key: String, payload: Long)

  class DedupProcessor(ttlMs: Long)
      extends StatefulProcessor[String, Rec, Rec] {
    @transient private var seen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Long]("seen", Encoders.scalaLong,
        TTLConfig(java.time.Duration.ofMillis(ttlMs)))

    override def handleInputRows(
        key: String,
        rows: Iterator[Rec],
        timerValues: TimerValues): Iterator[Rec] =
      if (seen.exists()) {
        seen.update(seen.get() + rows.size) // refresh the TTL; keep a count
        Iterator.empty
      } else {
        var best = Long.MaxValue
        var n = 0L
        while (rows.hasNext) { val r = rows.next(); n += 1; if (r.payload < best) best = r.payload }
        seen.update(n)
        Iterator.single(Rec(key, best))
      }
  }

  /** First-seen-within-TTL records per key; ProcessingTime time mode
    * (required for ValueState TTL), update output.
    */
  def dedup(recs: Dataset[Rec], ttlMs: Long): Dataset[Rec] = {
    import recs.sparkSession.implicits._
    org.apache.spark.sql.graftbridge.StateBridge.ensureStateStoreCoordinator(recs.sparkSession)
    recs
      .groupByKey(_.key)
      .transformWithState(new DedupProcessor(ttlMs), TimeMode.ProcessingTime(), OutputMode.Update())
  }
}
