package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful gap-based sessionization for streams — the
  * `flatMapGroupsWithState` operator the reference never uses (its session
  * state lives implicitly in window aggregates; SURVEY §2.9).
  *
  * Per user, an open session lives in executor state; an event arriving more
  * than `gapSeconds` after the previous one closes the session and emits it.
  * A processing-time timeout flushes sessions for users that went quiet.
  *
  * Scale shape: state is O(active users) — one small record each — sharded by
  * the stream's user-key partitioning; no global coordination.
  */
object GapSessionizer {

  final case class Event(user_id: Long, ts_s: Long, value: Double)
  final case class OpenSession(start_s: Long, last_s: Long, n_events: Long, total_value: Double)
  final case class ClosedSession(
      user_id: Long,
      start_s: Long,
      end_s: Long,
      n_events: Long,
      duration_s: Long,
      total_value: Double
  )

  def close(userId: Long, s: OpenSession): ClosedSession =
    ClosedSession(userId, s.start_s, s.last_s, s.n_events, s.last_s - s.start_s, s.total_value)

  /** The per-group state-transition function — pure, unit-testable.
    * `timeoutMs <= 0` means the query runs with NoTimeout (sessions close
    * only on gap evidence; no idle flush).
    */
  def processGroup(
      userId: Long,
      events: Iterator[Event],
      state: GroupState[OpenSession],
      gapSeconds: Long,
      timeoutMs: Long
  ): Iterator[ClosedSession] = {
    if (state.hasTimedOut) {
      val out = state.getOption.map(close(userId, _))
      state.remove()
      out.iterator
    } else {
      val sorted = events.toSeq.sortBy(_.ts_s)
      var open = state.getOption
      val closed = Seq.newBuilder[ClosedSession]
      sorted.foreach { e =>
        open match {
          case Some(s) if e.ts_s - s.last_s > gapSeconds =>
            closed += close(userId, s)
            open = Some(OpenSession(e.ts_s, e.ts_s, 1, e.value))
          case Some(s) =>
            open = Some(OpenSession(s.start_s, math.max(s.last_s, e.ts_s), s.n_events + 1,
              s.total_value + e.value))
          case None =>
            open = Some(OpenSession(e.ts_s, e.ts_s, 1, e.value))
        }
      }
      open.foreach { s =>
        state.update(s)
        if (timeoutMs > 0) state.setTimeoutDuration(timeoutMs)
      }
      closed.result().iterator
    }
  }

  /** Wire the operator over a (streaming or static) Dataset[Event].
    *
    * `timeoutMs > 0` enables a processing-time timeout that flushes sessions
    * of users that went idle — note a timeout-bearing query never fully
    * quiesces (timeouts schedule further batches), so synchronous tests use
    * `timeoutMs = 0` (NoTimeout) and cover the flush path via
    * [[processGroup]] directly.
    */
  def sessions(
      events: Dataset[Event],
      gapSeconds: Long = 1800L,
      timeoutMs: Long = 60000L
  ): Dataset[ClosedSession] = {
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val outEnc = Encoders.product[ClosedSession]
    val timeoutConf =
      if (timeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        (uid, it, st: GroupState[OpenSession]) => processGroup(uid, it, st, gapSeconds, timeoutMs)
      )
  }
}
