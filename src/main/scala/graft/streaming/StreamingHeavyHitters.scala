package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.HeavyHitters]] — a LIVE Misra–Gries
  * summary per group maintained in `flatMapGroupsWithState` state, so the
  * "what's hot right now" question (trending items, runaway keys, abuse
  * spikes) is answered continuously without re-scanning history.
  *
  * The state is the classic sequential MG summary: ≤ k−1 counters plus
  * the running group size n. The standard guarantee holds at every
  * instant, for any arrival order: each counter lower-bounds its item's
  * true frequency by at most n/k, and EVERY item with true frequency
  * > n/k is present in the summary. After each micro-batch the group
  * re-emits its current summary (update semantics — rows for a group
  * supersede earlier ones). IMPORTANT for consumers: eviction is never
  * retracted — an item dropped from the summary in a later batch simply
  * stops being re-emitted, so an append-style sink accumulates stale
  * (group, item) rows from earlier batches. Only the LATEST batch per
  * group is the current candidate set: read through an update-semantics
  * sink (memory/update, a keyed KV store) or filter to the max batch id
  * per group before treating rows as live candidates (then run the batch
  * operator's exact-recount pass 2 over those).
  *
  * Scale shape: O(k) state per group — independent of item cardinality,
  * the whole point of MG — and O(batch) work per micro-batch.
  */
object StreamingHeavyHitters {

  final case class Item(group: String, item: String)
  final case class HHState(items: Map[String, Long], n: Long)
  final case class Summary(group: String, item: String, mg_lower: Long, n_group: Long)

  /** Pure per-group transition: fold the batch into the MG summary, emit
    * the updated summary.
    */
  def processGroup(
      key: String,
      it: Iterator[Item],
      state: GroupState[HHState],
      k: Int
  ): Iterator[Summary] = {
    val prev = state.getOption.getOrElse(HHState(Map.empty, 0L))
    val m = mutable.HashMap.empty[String, Long]
    prev.items.foreach { case (i, c) => m.update(i, c) }
    var n = prev.n
    it.foreach { o =>
      n += 1
      m.get(o.item) match {
        case Some(c) => m.update(o.item, c + 1)
        case None if m.size < k - 1 => m.update(o.item, 1L)
        case None =>
          val keys = m.keysIterator.toArray
          keys.foreach { key2 =>
            val c = m(key2)
            if (c == 1L) m.remove(key2) else m.update(key2, c - 1)
          }
      }
    }
    state.update(HHState(m.toMap, n))
    m.iterator.map { case (i, c) => Summary(key, i, c, n) }
  }

  /** Wire over a (streaming or static) Dataset[Item]; NoTimeout — the
    * summary only changes on data.
    */
  def summaries(items: Dataset[Item], k: Int): Dataset[Summary] = {
    implicit val stateEnc = Encoders.product[HHState]
    implicit val outEnc = Encoders.product[Summary]
    items
      .groupByKey(_.group)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout)(
        (key: String, it: Iterator[Item], st: GroupState[HHState]) =>
          processGroup(key, it, st, k))
  }
}
