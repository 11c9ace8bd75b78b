package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.GraftSession

/** Accessors for the driver-provided parquet tables (TESTDATA.md).
  *
  * All loads are plain parquet scans — column pruning and predicate pushdown
  * reach the file scan untouched (verify with `.explain`: `PushedFilters`,
  * `ReadSchema`). No caching here: callers decide lifetime.
  */
final case class Tables(spark: SparkSession, dir: String) {
  GraftSession.tune(spark)

  private def p(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame    = p("region")
  def nation: DataFrame    = p("nation")
  def customer: DataFrame  = p("customer")
  def supplier: DataFrame  = p("supplier")
  def part: DataFrame      = p("part")
  def orders: DataFrame    = p("orders")
  def lineitem: DataFrame  = p("lineitem")
  def documents: DataFrame = p("documents")
  def embeddings: DataFrame = p("embeddings")

  /** `events` ships with parquet TIMESTAMP(NANOS) which Spark reads (under
    * `nanosAsLong`) as a raw long of nanos-since-epoch. Expose:
    *   - `ts`    — proper TimestampType (micros, truncated from nanos)
    *   - `ts_ns` — the original nanos long, for exact arithmetic
    */
  def events: DataFrame = {
    val raw = p("events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw
          .withColumn("ts_ns", col("ts"))
          .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _ =>
        // Driver-regenerated data ships ts as parquet timestamp[us] (read as
        // TIMESTAMP_NTZ). Normalize to TimestampType (session TZ is UTC) and
        // synthesize ts_ns = micros * 1000 so downstream exact arithmetic
        // (`ts_ns DIV 1000`) agrees bit-for-bit with DuckDB's epoch_ns(ts),
        // which also carries zero sub-micro digits here. ANSI forbids
        // NTZ -> BIGINT, so go through unix_micros, not CAST(ts AS LONG).
        raw
          .withColumn("ts", col("ts").cast("timestamp"))
          .withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
    }
  }

  /** Typed accessors — `Dataset[T]` views of the same scans. */
  def eventsDs: org.apache.spark.sql.Dataset[graft.schema.Schemas.Event] = {
    import spark.implicits._
    events.as[graft.schema.Schemas.Event]
  }
  def documentsDs: org.apache.spark.sql.Dataset[graft.schema.Schemas.Document] = {
    import spark.implicits._
    documents.as[graft.schema.Schemas.Document]
  }
  def embeddingsDs: org.apache.spark.sql.Dataset[graft.schema.Schemas.Embedding] = {
    import spark.implicits._
    embeddings.as[graft.schema.Schemas.Embedding]
  }

  /** The reference's clickstream shape (reference: src/streaming/config.py:144-157)
    * projected from the synthetic `events` table, for parity pipelines:
    * user_id plays the session key, `value` plays price, and the JSON `props`
    * `k` field plays product_id (exercises from_json-style extraction, P9).
    */
  def clickstream: DataFrame =
    events.select(
      col("ts").as("event_time"),
      col("event_type"),
      regexp_extract(col("props"), "\"k\": (\\d+)", 1).as("product_id"),
      col("value").as("price"),
      col("user_id").cast("string").as("user_session")
    )
}
