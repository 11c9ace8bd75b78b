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

  /** Pure per-group transition — unit-testable like GapSessionizer's. */
  def processGroup(
      key: Long,
      rows: Iterator[In],
      state: GroupState[LastRight]
  ): Iterator[Out] = {
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
    last.foreach(state.update)
    out.result().iterator
  }

  def join(tagged: Dataset[In]): Dataset[Out] = {
    implicit val stateEnc = Encoders.product[LastRight]
    implicit val outEnc = Encoders.product[Out]
    tagged
      .groupByKey(_.key)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(
        (k, it, st: GroupState[LastRight]) => processGroup(k, it, st)
      )
  }
}
