package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamJob

/** The S4/S5 Kafka source/sink pair is the inventory's only untested
  * surface — blocked since r5 by the environment (no
  * spark-sql-kafka connector jar in /opt/spark/jars, no broker). This
  * spec turns the standing NOTES claim into a machine check that
  * self-updates:
  *
  *   - while the connector is ABSENT, the dispatch must fail with the
  *     documented DATA_SOURCE_NOT_FOUND error (anything else means the
  *     wiring itself broke);
  *   - the round a connector jar APPEARS, the same call resolves the
  *     source and must yield a STREAMING frame with the parsed event
  *     schema — the signal to wire the live-broker path end to end.
  */
class KafkaPathSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("kafka dispatch: documented failure without the connector; parsed stream with it") {
    val attempt =
      try Right(StreamJob.kafkaSource(spark, StreamJob.Config()))
      catch { case e: Throwable => Left(e) }
    attempt match {
      case Left(e) =>
        // the env-blocked branch: exactly the missing-data-source error,
        // not an option/typo/classpath regression in graft's own wiring
        val msg = (e.getMessage + Option(e.getCause).map(_.getMessage).mkString)
        assert(msg.toLowerCase.contains("kafka"),
          s"kafka dispatch failed for a NON-connector reason: $e")
        assert(msg.contains("Failed to find the data source")
            || msg.contains("Failed to find data source")
            || msg.contains("DATA_SOURCE_NOT_FOUND"),
          s"expected the missing-connector error, got: $e")
      case Right(df) =>
        // a connector appeared: the dispatch must produce the parsed
        // streaming schema (wire the live-broker path this round!)
        assert(df.isStreaming, "kafka source must be a streaming frame")
        val cols = df.columns.toSet
        assert(cols.contains("event_timestamp") && cols.contains("event_type"),
          s"parsed schema missing: ${df.columns.mkString(",")}")
    }
  }
}
