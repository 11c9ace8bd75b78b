package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.collection.mutable

/** S7: atomic JSON metrics sink — same document shape as the reference
  * (`{current, history[≤limit]}`, written temp-file-then-rename so the
  * dashboard process never reads a torn file; reference:
  * src/streaming/metrics_store.py:124-155).
  *
  * JSON is emitted by a minimal hand-rolled writer (strings, numbers,
  * booleans, maps, sequences) — no external dependencies.
  */
final class MetricsStore(path: String, historyLimit: Int = 1000) {

  private val history = mutable.Queue.empty[Map[String, Any]]

  def update(current: Map[String, Any]): Unit = synchronized {
    history.enqueue(current)
    while (history.size > historyLimit) history.dequeue()
    val doc = Map("current" -> current, "history" -> history.toSeq)
    val target = Paths.get(path)
    Option(target.getParent).foreach(Files.createDirectories(_))
    val tmp: Path = Paths.get(path + ".tmp")
    Files.write(tmp, MetricsStore.toJson(doc).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  def latest: Option[Map[String, Any]] = synchronized(history.lastOption)
  def size: Int = synchronized(history.size)
}

object MetricsStore {

  /** §2.11 serving-plane reads: load the metrics document as DataFrames so
    * the dashboard queries (conversion-rate time series, event-distribution
    * totals, prediction table — reference dashboard/app.py:227-354) are
    * plain Spark queries instead of driver-side JSON walking.
    */
  def historyFrame(spark: org.apache.spark.sql.SparkSession, path: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read.option("multiLine", "true").json(path)
      .select(explode(col("history")).as("h"))
      .select("h.*")
  }

  /** Conversion-rate time series, most recent `n` batches. */
  def conversionSeries(spark: org.apache.spark.sql.SparkSession, path: String, n: Int = 50): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    historyFrame(spark, path)
      .select(col("batch_id"), col("timestamp"), col("conversion_rate"))
      .orderBy(col("batch_id").desc)
      .limit(n)
  }

  def toJson(v: Any): String = v match {
    case null            => "null"
    case s: String       => quote(s)
    case b: Boolean      => b.toString
    case d: Double       => if (d.isNaN || d.isInfinite) "null" else d.toString
    case f: Float        => toJson(f.toDouble)
    case n: Number       => n.toString
    case m: collection.Map[_, _] =>
      m.map { case (k, x) => s"${quote(k.toString)}:${toJson(x)}" }.mkString("{", ",", "}")
    case s: collection.Seq[_]  => s.map(toJson).mkString("[", ",", "]")
    case a: Array[_]     => a.map(toJson).mkString("[", ",", "]")
    case other           => quote(other.toString)
  }

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case '\n'         => "\\n"
      case '\r'         => "\\r"
      case '\t'         => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    } + "\""
}
