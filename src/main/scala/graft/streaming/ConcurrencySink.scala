package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.IntervalOverlap

/** Streaming end of the concurrency-timeline story: upstream,
  * `IntervalOverlap.boundaryDeltas` runs as ONE stateful streaming aggregate
  * over closed intervals (complete output mode — its state is the per-bucket
  * delta table, O(time-range / width) rows, bounded by the calendar). Each
  * trigger hands that table to `foreachBatch` as a plain batch frame, where
  * folding the running `n_open_after` prefix is the same
  * `IntervalOverlap.openAfter` window the batch `concurrencyTimeline` uses —
  * so a live stream publishes exactly the timeline `q_concurrency_timeline`
  * pins on batch (StreamingSpec replays two micro-batches and asserts
  * equality).
  *
  * Reference scope: the reference's streaming analytics stop at windowed
  * session aggregates (src/streaming/stream_processor.py:170-201);
  * concurrency is part of the training-pipeline extension set (SURVEY §2.12).
  */
object ConcurrencySink {

  /** Wire a streaming boundary-delta frame into a foreachBatch sink that
    * publishes the full concurrency timeline every trigger.
    */
  def start(deltas: DataFrame, checkpointDir: String)(
      publish: DataFrame => Unit): StreamingQuery =
    deltas.writeStream
      .outputMode("complete")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        publish(IntervalOverlap.openAfter(batch))
      }
      .start()
}
