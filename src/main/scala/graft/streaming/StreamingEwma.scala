package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.Ewma]] — the integer-EWMA level per
  * event type maintained LIVE by `flatMapGroupsWithState`, so the anomaly
  * baseline the batch operator computes over history is also available as
  * a continuously-updated stream (ops alerting without a nightly job).
  *
  * Exactly the batch recurrence (s += ⌊(10⁶x − s)/2^shift⌋, zero-filled
  * gap buckets included), with streaming emission semantics: a bucket is
  * emitted once it is CLOSED — a strictly later bucket has been observed
  * for that key — since only then is its count complete (bucket-aligned
  * arrival assumed; a watermark-delayed variant would trade latency for
  * late-data tolerance). The still-open bucket's running count waits in
  * state. Divergence from batch, stated honestly: the batch grid starts
  * every type at the GLOBAL min bucket; a stream knows only each key's
  * own first bucket, so parity holds when each type's first event falls
  * in the global origin bucket (StreamingSpec constructs exactly that;
  * types idle at the stream head otherwise differ by their zero-prefix).
  *
  * Scale shape: state is O(|event types|) — a handful of longs each; all
  * sequential work is per-key and bounded per micro-batch.
  */
object StreamingEwma {

  /** One row per event. */
  final case class Obs(event_type: String, bucket: Long)
  final case class EwmaState(
      s: Long,
      lastEmitted: Long,
      pendingBucket: Long,
      pendingCount: Long,
      started: Boolean,
      droppedLate: Long = 0L
  )
  final case class Point(event_type: String, bucket_s: Long, n_events: Long, ewma_micros: Long)

  /** One recurrence step (shared with the batch spelling). */
  def step(s: Long, x: Long, first: Boolean, shift: Int): Long =
    if (first) x * 1000000L
    else s + math.floor((x * 1000000L - s).toDouble / (1L << shift).toDouble).toLong

  /** Pure per-group transition: merge the batch's bucket counts with the
    * pending open bucket, emit every bucket strictly below the newest one
    * (zero-filling gaps), keep the newest open.
    */
  def processGroup(
      key: String,
      it: Iterator[Obs],
      state: GroupState[EwmaState],
      shift: Int,
      bucketSeconds: Long
  ): Iterator[Point] = {
    val st = state.getOption.getOrElse(EwmaState(0L, 0L, 0L, -1L, started = false))
    var counts = it.foldLeft(Map.empty[Long, Long]) { (m, o) =>
      m.updated(o.bucket, m.getOrElse(o.bucket, 0L) + 1L)
    }
    if (st.pendingCount >= 0L)
      counts = counts.updated(st.pendingBucket,
        counts.getOrElse(st.pendingBucket, 0L) + st.pendingCount)
    if (counts.isEmpty) return Iterator.empty
    val maxB = counts.keys.max
    val origin = if (st.started) st.lastEmitted + 1 else counts.keys.min
    // Bucket-aligned arrival is an ASSUMPTION, not an invariant: an
    // observation landing at or below lastEmitted can no longer change an
    // emitted level. Count it (cumulatively, in state) instead of letting
    // the violation vanish silently — ops can alert on a growing counter.
    val late =
      if (st.started) counts.iterator.collect { case (b, c) if b < origin => c }.sum
      else 0L
    var s = st.s
    var started = st.started
    val out = Seq.newBuilder[Point]
    var b = origin
    while (b < maxB) {
      val x = counts.getOrElse(b, 0L)
      s = step(s, x, !started, shift)
      started = true
      out += Point(key, b * bucketSeconds, x, s)
      b += 1
    }
    state.update(EwmaState(s, maxB - 1, maxB, counts(maxB), started, st.droppedLate + late))
    out.result().iterator
  }

  /** Wire over a (streaming or static) Dataset[Obs]; NoTimeout — the open
    * bucket flushes only on evidence of a later one (the GapSessionizer
    * synchronous-test discipline).
    */
  def levels(
      events: Dataset[Obs],
      shift: Int = 3,
      bucketSeconds: Long = 86400L
  ): Dataset[Point] = {
    implicit val stateEnc = Encoders.product[EwmaState]
    implicit val outEnc = Encoders.product[Point]
    events
      .groupByKey(_.event_type)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(
        (k: String, it: Iterator[Obs], st: GroupState[EwmaState]) =>
          processGroup(k, it, st, shift, bucketSeconds))
  }
}
