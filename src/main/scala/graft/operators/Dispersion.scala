package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Burstiness diagnostics — the Fano factor (index of dispersion,
  * variance/mean) of each event type's hourly arrival counts over the
  * DENSE global hour grid (absent hours count 0; a Poisson process gives
  * F ≈ 1, bursty traffic F ≫ 1, metronomic bots F ≪ 1).
  *
  * Determinism: the dense grid is types × [min hour, max hour]; per-type
  * T, Σx, Σx² are exact integers; mean and Fano are single replayed
  * double expressions (population variance Q/T − m²), floor-6 output.
  *
  * Scale: the hourly rollup is map-side combinable; the dense grid is
  * |types| × hours — tiny at any SF; no fact-table sort or window.
  */
object Dispersion {

  private def floor6(c: Column): Column =
    floor(c * lit(1000000.0d) + lit(0.5d)) / lit(1000000.0d)

  /** (event_type, n_hours, mean_per_hour, fano) per event type. */
  def fanoByType(events: DataFrame): DataFrame = {
    val hc = events
      .groupBy(col("event_type"), expr("CAST(ts AS LONG) DIV 3600").as("h"))
      .agg(count(lit(1)).as("c"))
    val grid = events
      .agg(
        min(expr("CAST(ts AS LONG) DIV 3600")).as("h0"),
        max(expr("CAST(ts AS LONG) DIV 3600")).as("h1"))
      .select(explode(sequence(col("h0"), col("h1"))).as("h"))
      .crossJoin(events.select("event_type").distinct())
    val dense = grid
      .join(hc, Seq("event_type", "h"), "left")
      .select(col("event_type"), coalesce(col("c"), lit(0L)).as("x"))
    val ag = dense
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_hours"),
        sum(col("x")).as("s"),
        sum(col("x") * col("x")).as("q"))
    val m = col("s").cast("double") / col("n_hours").cast("double")
    ag.select(
      col("event_type"),
      col("n_hours"),
      floor6(m).as("mean_per_hour"),
      floor6((col("q").cast("double") / col("n_hours").cast("double") - m * m) / m)
        .as("fano"))
  }
}
