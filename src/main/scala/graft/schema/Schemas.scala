package graft.schema

import java.sql.Timestamp

/** Case-class row types for the engine's tables — the typed `Dataset[T]`
  * surface for pipelines that want compile-time field checks (SURVEY §1.1's
  * "Spark-native equivalent" column). DataFrame stays the default where
  * schemas are dynamic.
  */
object Schemas {

  /** Synthetic events table (TESTDATA.md) after Tables.events normalization. */
  final case class Event(
      event_id: Long,
      ts: Timestamp,
      ts_ns: Long,
      user_id: Long,
      event_type: String,
      value: Double,
      props: String
  )

  /** Reference clickstream row (FIXTURES A1). */
  final case class ClickEvent(
      event_time: Timestamp,
      event_type: String,
      product_id: String,
      price: Double,
      user_session: String
  )

  /** Session-feature row (FIXTURES A2 / reference preprocessing output). */
  final case class SessionFeatures(
      user_session: String,
      label: Int,
      view_count: Long,
      cart_count: Long,
      session_duration: Long,
      avg_price: Double,
      max_price: Double,
      unique_items: Long
  )

  final case class Document(
      doc_id: Long,
      text: String,
      lang: String,
      source: String,
      n_chars: Long
  )

  final case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)
}
