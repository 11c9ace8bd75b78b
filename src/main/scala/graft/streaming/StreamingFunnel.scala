package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.Funnel]] — per-user ordered-funnel
  * progress maintained incrementally in `flatMapGroupsWithState` state and
  * emitted in Update mode whenever a user advances a stage.
  *
  * Semantics: the state holds the timestamps of the completed step PREFIX
  * (step i+1 can only complete at-or-after step i — the batch operator's
  * `>=` chaining). Within a micro-batch events replay in (ts, step-index)
  * order, so same-instant progression counts exactly as in batch. For
  * per-user event-time-ordered arrival the final state equals
  * `Funnel.ordered` on the same events (parity-spec'd); a LATE earlier
  * event cannot retroactively lower an already-completed step — exact
  * retroactivity would require retaining every event per user forever,
  * which no bounded-state stream can do. That monotone-advance trade is
  * the standard streaming-funnel contract.
  *
  * Scale shape: state is O(active users) × O(steps) longs, sharded by the
  * stream's user-key partitioning; no timeout (funnels do not expire —
  * idle users cost a few dozen bytes until the checkpoint retention policy
  * reaps them; NoTimeout also keeps synchronous tests hang-free).
  */
object StreamingFunnel {

  final case class Event(user_id: Long, event_type: String, ts_us: Long)
  /** Completed prefix: `times(i)` is the instant step i+1 completed. */
  final case class Progress(times: List[Long])
  final case class Update(user_id: Long, times: Seq[Long], stage: Int)

  /** Pure per-group transition: fold the batch's relevant events in
    * (ts, step) order, extend the completed prefix where the next expected
    * step qualifies, emit one Update iff the user advanced.
    */
  def processGroup(
      userId: Long,
      events: Iterator[Event],
      state: GroupState[Progress],
      steps: Seq[String]
  ): Iterator[Update] = {
    val stepIdx = steps.zipWithIndex.toMap
    val relevant = events.filter(e => stepIdx.contains(e.event_type)).toSeq
      .sortBy(e => (e.ts_us, stepIdx(e.event_type)))
    val before = state.getOption.map(_.times).getOrElse(Nil)
    var times = before
    relevant.foreach { e =>
      val k = times.length
      if (k < steps.length && steps(k) == e.event_type &&
        (k == 0 || e.ts_us >= times.last)) {
        times = times :+ e.ts_us
      }
    }
    if (times != before) {
      state.update(Progress(times))
      Iterator.single(Update(userId, times, times.length))
    } else Iterator.empty
  }

  /** Wire over a (streaming or static) Dataset[Event]; emits Update rows
    * in OutputMode.Update — downstream sinks keep the max-stage row per
    * user (stage only grows).
    */
  def funnel(events: Dataset[Event], steps: Seq[String]): Dataset[Update] = {
    require(steps.nonEmpty, "steps must be non-empty")
    implicit val stateEnc = Encoders.product[Progress]
    implicit val outEnc = Encoders.product[Update]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout)(
        (uid, it, st: GroupState[Progress]) => processGroup(uid, it, st, steps)
      )
  }
}
