package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** transformWithState (Spark 4's arbitrary-state API, the successor to
  * map/flatMapGroupsWithState): typed composable state variables behind a
  * `StatefulProcessor`, with timers and per-state TTL — the API a new
  * stateful operator should target. This operator is the battery's
  * canonical example: a per-user running activity counter in ONE
  * `ValueState[Long]`, emitting the updated total each time a key sees
  * rows.
  *
  * The processor also runs in BATCH queries (Spark 4 executes
  * transformWithState statically — every key's rows arrive as one group),
  * where the emitted totals must equal a plain groupBy count — that static
  * parity is hash-oracled (`q_tws_counts`), the [[StreamingFunnel]]
  * discipline applied to the new API. The spec drives the genuinely
  * streaming path (RocksDB state store, update mode, two micro-batches).
  */
object TwsActivity {

  final case class Click(user_id: Long, event_type: String)
  final case class UserCount(user_id: Long, n_events: Long)

  class CounterProcessor extends StatefulProcessor[Long, Click, UserCount] {
    @transient private var count: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      count = getHandle.getValueState[Long]("count", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[Click],
        timerValues: TimerValues): Iterator[UserCount] = {
      val prev = if (count.exists()) count.get() else 0L
      val n = prev + rows.size
      count.update(n)
      Iterator.single(UserCount(key, n))
    }
  }

  final case class SessionEvent(user_id: Long, kind: String, n_events: Long)

  /** The TTL + processing-time-timer surface of the new API (the one
    * [[CounterProcessor]] doesn't touch): the counter ValueState carries a
    * real `TTLConfig(ttl)` — an idle key's count EVICTS by wall clock and
    * `exists()` turns false, so the next arrival restarts from zero — and
    * every arrival (re)arms a processing-time timer at now + timerMs;
    * when a later micro-batch passes the expiry, `handleExpiredTimer`
    * emits a `("timer", count)` row for the idle key — the classic
    * inactivity-session close. Timers fire at micro-batch boundaries (a
    * batch must run for expiry to be observed), which is the API's
    * contract, not a test shortcut.
    *
    * Note the deliberate asymmetry available here: ttl and timer are
    * independent clocks — a short TTL with a long timer gives
    * evict-but-never-close; the spec drives both ends.
    */
  class SessionProcessor(ttlMs: Long, timerMs: Long)
      extends StatefulProcessor[Long, Click, SessionEvent] {
    @transient private var count: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      count = getHandle.getValueState[Long]("count", Encoders.scalaLong,
        TTLConfig(java.time.Duration.ofMillis(ttlMs)))

    override def handleInputRows(
        key: Long,
        rows: Iterator[Click],
        timerValues: TimerValues): Iterator[SessionEvent] = {
      val prev = if (count.exists()) count.get() else 0L // TTL-expired reads as absent
      val n = prev + rows.size
      count.update(n)
      // registerTimer ADDS to a per-key timer set (it does not replace):
      // without clearing, every arrival leaves a stale timer behind and an
      // ACTIVE key gets a premature "timer" close timerMs after its FIRST
      // arrival, plus one duplicate close per later arrival
      val it = getHandle.listTimers()
      while (it.hasNext) getHandle.deleteTimer(it.next())
      getHandle.registerTimer(timerValues.getCurrentProcessingTimeInMs() + timerMs)
      Iterator.single(SessionEvent(key, "update", n))
    }

    override def handleExpiredTimer(
        key: Long,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionEvent] =
      Iterator.single(SessionEvent(key, "timer",
        if (count.exists()) count.get() else 0L))
  }

  /** [[SessionProcessor]] wired up: ProcessingTime time mode (required for
    * both ValueState TTL and processing-time timers), update output.
    */
  def sessions(clicks: Dataset[Click], ttlMs: Long, timerMs: Long): Dataset[SessionEvent] = {
    import clicks.sparkSession.implicits._
    org.apache.spark.sql.graftbridge.StateBridge.ensureStateStoreCoordinator(clicks.sparkSession)
    clicks
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(ttlMs, timerMs),
        TimeMode.ProcessingTime(), OutputMode.Update())
  }

  final case class StampedClick(user_id: Long, event_type: String, ts: java.sql.Timestamp)

  /** The EVENT-TIME timer surface of the new API — the remaining TimeMode
    * after [[CounterProcessor]] (None) and [[SessionProcessor]]
    * (ProcessingTime), and the one a reorderable event stream actually
    * wants: the inactivity close is defined by the DATA's clock, so a
    * delayed replay closes the same sessions at the same (event-time)
    * points regardless of wall-clock pacing. Every arrival re-arms a
    * single event-time timer at max(event time seen) + gapMs (the same
    * delete-then-register sweep as SessionProcessor — registerTimer ADDS);
    * the timer fires when the WATERMARK passes it, i.e. only a later
    * batch's event-time progress can close a session. handleExpiredTimer
    * emits the close and CLEARS the count, so the key's next arrival
    * starts a fresh session — the gap-session semantic, state bounded by
    * one ValueState per open session.
    */
  class EventTimeSessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, StampedClick, SessionEvent] {
    @transient private var count: ValueState[Long] = _
    @transient private var maxSeen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      count = getHandle.getValueState[Long]("count", Encoders.scalaLong, TTLConfig.NONE)
      // max event time EVER seen for the open session — the timer must be
      // re-armed from this, not from the current batch's max alone: a
      // late-but-above-watermark row would otherwise pull the close timer
      // BACKWARDS and split one gap-session into two (r19 self-review)
      maxSeen = getHandle.getValueState[Long]("max_ts", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(
        key: Long,
        rows: Iterator[StampedClick],
        timerValues: TimerValues): Iterator[SessionEvent] = {
      var n = if (count.exists()) count.get() else 0L
      var maxTs = if (maxSeen.exists()) maxSeen.get() else Long.MinValue
      rows.foreach { r =>
        n += 1
        if (r.ts.getTime > maxTs) maxTs = r.ts.getTime
      }
      count.update(n)
      maxSeen.update(maxTs)
      val it = getHandle.listTimers()
      while (it.hasNext) getHandle.deleteTimer(it.next())
      getHandle.registerTimer(maxTs + gapMs)
      Iterator.single(SessionEvent(key, "update", n))
    }

    override def handleExpiredTimer(
        key: Long,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionEvent] = {
      val n = if (count.exists()) count.get() else 0L
      count.clear() // session closed by event time; the next arrival restarts
      maxSeen.clear()
      Iterator.single(SessionEvent(key, "close", n))
    }
  }

  /** [[EventTimeSessionProcessor]] wired up: the input stream must carry a
    * watermark on `ts` (EventTime mode requires it — the watermark IS the
    * timer clock), update output.
    */
  def eventSessions(
      clicks: Dataset[StampedClick],
      gapMs: Long,
      delay: String): Dataset[SessionEvent] = {
    import clicks.sparkSession.implicits._
    org.apache.spark.sql.graftbridge.StateBridge.ensureStateStoreCoordinator(clicks.sparkSession)
    clicks
      .withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .transformWithState(new EventTimeSessionProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Update())
  }

  /** Running per-user event totals; in update mode each touched key emits
    * its new total per micro-batch.
    */
  def activity(clicks: Dataset[Click]): Dataset[UserCount] = {
    import clicks.sparkSession.implicits._
    // batch transformWithState needs the coordinator a streaming query
    // would have created lazily (see StateBridge) — idempotent, harmless
    // when the input is a stream
    org.apache.spark.sql.graftbridge.StateBridge.ensureStateStoreCoordinator(clicks.sparkSession)
    clicks
      .groupByKey(_.user_id)
      .transformWithState(new CounterProcessor, TimeMode.None(), OutputMode.Update())
  }
}
