package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exponentially-weighted moving average of each event type's bucketed
  * arrival counts — the classic smoothing baseline behind ops anomaly
  * alerting (Roberts 1959's EWMA control chart; Hunter 1986) that
  * [[Anomaly]]'s global z-score deliberately does not provide: a LOCAL,
  * recency-weighted level per series.
  *
  * Replayability: a float EWMA chain diverges across engines after a few
  * hundred steps (every step compounds one rounding). This is the
  * INTEGER recurrence with α = 1/2^shift:
  *
  *   s_1 = 10⁶·x_1;   s_t = s_{t−1} + ⌊(10⁶·x_t − s_{t−1}) / 2^shift⌋
  *
  * — every state is an exact BIGINT (micros of events/hour), the floor
  * division is spelled floor(Δ / 2^shift as double) which is exact for
  * |Δ| < 2⁵³ and engine-identical (NOT integer DIV: Spark truncates
  * toward zero while DuckDB floors, and Δ goes negative on every decay —
  * the Attribution sign lesson). The DuckDB oracle replays the same
  * recurrence as a recursive CTE; the q_gmm_soft generated-replay
  * precedent extended to unbounded-length sequential state.
  *
  * Scale shape: one map-side-combinable bucket rollup, one broadcast-size
  * grid (|types| × global bucket span, zero-filled — the [[Dispersion]]
  * spine), then ONE shuffle keyed by series grouping the dense series
  * into an in-row array for a single sequential fold. Per-series state is
  * one array bounded by the CALENDAR (buckets in the data's span), not by
  * data volume — at 100 TB the rollup shrinks the fact table to
  * |types|·hours rows before anything sequential happens. The fold lambda
  * touches only its accumulator and element (no re-evaluated captures).
  */
object Ewma {

  /** (event_type, bucket_s, n_events, ewma_micros, ewma) over the dense
    * global bucket grid, ordered within each type by bucket. Bucket width
    * defaults to DAYS: the oracle replays the recurrence as a recursive
    * CTE whose per-iteration overhead (~20 ms in DuckDB) is paid per
    * STEP, so the checkable contract uses the 30-step daily series; the
    * operator itself takes any width (the Spark side is one fold either
    * way — hourly at sf0.1 measured within noise of daily).
    */
  def bucketEwma(
      events: DataFrame,
      bucketSeconds: Long = 86400L,
      shift: Int = 3
  ): DataFrame = {
    require(shift >= 1 && shift <= 20, s"shift $shift out of range")
    val pow = (1L << shift).toDouble
    val hc = events
      .groupBy(col("event_type"),
        expr(s"CAST(ts AS LONG) DIV $bucketSeconds").as("h"))
      .agg(count(lit(1)).as("c"))
    val grid = events
      .agg(
        min(expr(s"CAST(ts AS LONG) DIV $bucketSeconds")).as("h0"),
        max(expr(s"CAST(ts AS LONG) DIV $bucketSeconds")).as("h1"))
      .select(explode(sequence(col("h0"), col("h1"))).as("h"))
      .crossJoin(events.select("event_type").distinct())
    val dense = grid
      .join(hc, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"), coalesce(col("c"), lit(0L)).as("x"))
    val series = dense
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("h"), col("x")))).as("sv"))
    val folded = aggregate(
      col("sv"),
      struct(lit(0L).as("s"), lit(0).as("i"),
        array().cast("array<struct<h:bigint,x:bigint,s:bigint>>").as("out")),
      (acc, e) => {
        val xk = e.getField("x") * lit(1000000L)
        val s = when(acc.getField("i") === 0, xk)
          .otherwise(acc.getField("s") +
            floor((xk - acc.getField("s")).cast("double") / lit(pow)).cast("long"))
        struct(s.as("s"), (acc.getField("i") + 1).as("i"),
          concat(acc.getField("out"),
            array(struct(e.getField("h").as("h"), e.getField("x").as("x"),
              s.as("s")))).as("out"))
      },
      acc => acc.getField("out"))
    series
      .select(col("event_type"), explode(folded).as("e"))
      .select(col("event_type"),
        (col("e").getField("h") * bucketSeconds).as("bucket_s"),
        col("e").getField("x").as("n_events"),
        col("e").getField("s").as("ewma_micros"),
        (col("e").getField("s").cast("double") / lit(1000000.0d)).as("ewma"))
  }
}
