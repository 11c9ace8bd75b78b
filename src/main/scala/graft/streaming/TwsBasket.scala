package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** The composite-state surface of `transformWithState` — the two state
  * types [[TwsActivity]]'s ValueState processors don't touch:
  *
  *   - `MapState[String, Long]`: per-event-type counts under one key
  *     (point lookups + in-place increments, no read-modify-write of a
  *     whole map blob — the reason MapState exists);
  *   - `ListState[Long]`: the user's top-K purchase amounts (read,
  *     merge, trim, put).
  *
  * The list is maintained as TOP-K BY VALUE, not last-K by arrival:
  * within a micro-batch (and in batch execution) a group's row order is
  * not a contract, and a top-K is order-free — which is what makes the
  * operator's static parity hash-oracleable (`q_tws_basket`): batch
  * execution feeds every key's history as one group and the emitted
  * stats must equal the plain relational aggregate.
  */
object TwsBasket {

  final case class Act(user_id: Long, event_type: String, value_cents: Long)
  final case class BasketStat(user_id: Long, n_types: Long, n_events: Long,
      topk_cents: Long)

  class BasketProcessor(k: Int) extends StatefulProcessor[Long, Act, BasketStat] {
    @transient private var perType: MapState[String, Long] = _
    @transient private var topK: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      perType = getHandle.getMapState[String, Long]("per_type",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
      topK = getHandle.getListState[Long]("topk", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(
        key: Long,
        rows: Iterator[Act],
        timerValues: TimerValues): Iterator[BasketStat] = {
      // single pass, O(types + k) memory: in batch execution a key's
      // WHOLE history arrives as one group — never buffer it
      val localTypes = scala.collection.mutable.Map[String, Long]()
        .withDefaultValue(0L)
      val heap = scala.collection.mutable.PriorityQueue
        .empty[Long](Ordering[Long].reverse) // min-heap of the running top-k
      topK.get().foreach(heap.enqueue(_))
      var sawPurchase = false
      rows.foreach { act =>
        localTypes(act.event_type) += 1L
        if (act.event_type == "purchase") {
          sawPurchase = true
          heap.enqueue(act.value_cents)
          if (heap.size > k) heap.dequeue()
        }
      }
      localTypes.foreach { case (t, n) =>
        val prev = if (perType.containsKey(t)) perType.getValue(t) else 0L
        perType.updateValue(t, prev + n)
      }
      if (sawPurchase) topK.put(heap.toArray.sorted(Ordering[Long].reverse))
      var nTypes = 0L
      var nEvents = 0L
      val it = perType.iterator()
      while (it.hasNext) { val kv = it.next(); nTypes += 1; nEvents += kv._2 }
      Iterator.single(BasketStat(key, nTypes, nEvents, topK.get().sum))
    }
  }

  /** Batch/stream entry: update mode, no time semantics needed. */
  def stats(acts: Dataset[Act], k: Int = 3): Dataset[BasketStat] = {
    import acts.sparkSession.implicits._
    org.apache.spark.sql.graftbridge.StateBridge.ensureStateStoreCoordinator(acts.sparkSession)
    acts
      .groupByKey(_.user_id)
      .transformWithState(new BasketProcessor(k), TimeMode.None(), OutputMode.Update())
  }
}
