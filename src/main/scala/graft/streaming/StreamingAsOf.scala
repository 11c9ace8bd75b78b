package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of join — the T-plane twin of `operators.AsOfJoin`: attach
  * to every left event the most recent right event of the same key with
  * `right.ts <= left.ts`.
  *
  * State per key is ONE record (the latest right row seen) — O(keys), not
  * O(history), which is what makes this sustainable on an unbounded
  * stream; the batch union-scan spelling gets the same effect from its
  * running window.
  *
  * Ordering contract: rows within a micro-batch are processed in
  * (ts, side, id) order (right-before-left at equal ts → `<=` semantics,
  * exactly like the batch operator), so intra-batch disorder is handled.
  * ACROSS batches the operator is arrival-ordered, like any single-record
  * stateful streaming op: a right row arriving in a later batch than a
  * left row it should precede is not retroactively applied. Event-time
  * retroactivity would need watermark-buffered lefts — a deliberate
  * non-goal here (the batch spelling covers reprocessing).
  */
object StreamingAsOf {

  /** Tagged input: side 0 = right (build), side 1 = left (probe). */
  final case class In(key: Long, ts: Long, side: Int, id: Long)
  final case class LastRight(ts: Long, id: Long)
  final case class Out(
      key: Long,
      ts: Long,
      left_id: Long,
      right_id: Option[Long],
      right_ts: Option[Long]
  )

  /** Pure per-group transition — unit-testable like GapSessionizer's.
    * `timeoutMs > 0` arms a processing-time timeout after each batch that
    * touches the key; a timed-out key's state is evicted (keys that went
    * quiet stop costing memory — the knob that keeps state at O(ACTIVE
    * keys) on a corpus where keys churn). A left row for an evicted key
    * simply rejoins as unmatched, the same answer the batch operator gives
    * when no right row precedes it in the retained window.
    */
  def processGroup(
      key: Long,
      rows: Iterator[In],
      state: GroupState[LastRight],
      timeoutMs: Long = 0L
  ): Iterator[Out] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val sorted = rows.toSeq.sortBy(e => (e.ts, e.side, e.id))
      var last = state.getOption
      val out = Seq.newBuilder[Out]
      sorted.foreach { e =>
        if (e.side == 0) {
          if (last.forall(lr => e.ts > lr.ts || (e.ts == lr.ts && e.id > lr.id)))
            last = Some(LastRight(e.ts, e.id))
        } else {
          out += Out(key, e.ts, e.id, last.map(_.id), last.map(_.ts))
        }
      }
      last.foreach { lr =>
        state.update(lr)
        if (timeoutMs > 0) state.setTimeoutDuration(timeoutMs)
      }
      out.result().iterator
    }
  }

  /** `timeoutMs = 0` (default) keeps state forever (NoTimeout — what
    * synchronous tests need: a timeout-bearing query never quiesces under
    * `processAllAvailable`); production streams pass an idle-key TTL.
    */
  def join(tagged: Dataset[In], timeoutMs: Long = 0L): Dataset[Out] = {
    implicit val stateEnc = Encoders.product[LastRight]
    implicit val outEnc = Encoders.product[Out]
    val timeoutConf =
      if (timeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    tagged
      .groupByKey(_.key)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        (k, it, st: GroupState[LastRight]) => processGroup(k, it, st, timeoutMs)
      )
  }
}
