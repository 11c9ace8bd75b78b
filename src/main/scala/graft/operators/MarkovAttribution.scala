package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Markov removal-effect attribution (Anderl et al. 2014 — the standard
  * data-driven alternative to rule-based multi-touch): model user
  * journeys as a first-order chain `start → channels… → conv|null`,
  * measure each channel's value as the DROP in conversion mass when the
  * channel is deleted from the chain (its inbound transitions leak to
  * null, its outbound edges disappear), and share attribution
  * proportionally to those removal effects.
  *
  * Journey contract: events per user ordered by (micros, event_id) — the
  * engine-portable order ([[Markov.transitions]]) — TRUNCATED at the
  * first purchase (mapped to the absorbing `conv`); journeys without a
  * purchase close with an explicit `null` terminal.
  *
  * Determinism and scale (the [[BradleyTerry]] pattern): the corpus-scale
  * work is ONE user-key window + one (src, dst) aggregate; the chain
  * solve is a bounded driver fixed point over ≤ (|states|+3)² exact-Long
  * counts. Absorption is computed by `steps` rounds of INTEGER mass
  * propagation from 10⁹ micromass at `start` — each edge moves
  * `mass·cnt / out(src)` (Long division on non-negative operands, so
  * truncation ≡ floor in every engine), absorbing states carry their mass
  * forward — the q_ppr_contamination integer-mass discipline, so the
  * whole solve (and therefore the attribution) replays bit-for-bit in
  * the DuckDB oracle's unrolled CTEs. Removal keeps the ORIGINAL
  * denominators: surviving edges keep their probabilities and the
  * removed channel's share of every source's mass leaks out, which is
  * exactly "this channel stopped existing, journeys don't reroute".
  */
object MarkovAttribution {

  val Channels: Seq[String] = Seq("view", "click", "signup")

  /** Journey transition counts: `(src, dst, cnt)` with `start`/`conv`/
    * `null` sentinels. One window exchange on the user key.
    */
  def journeyTransitions(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val wAll = Window.partitionBy(col("user_id"))
    val marked = ev
      .select(col("user_id"), col("event_type").as("st"), col("ts_us"), col("event_id"))
      .withColumn("_pk",
        when(col("st") === "purchase", struct(col("ts_us"), col("event_id"))))
      .withColumn("_fp", min(col("_pk")).over(wAll))
      .filter(col("_fp").isNull
        || struct(col("ts_us"), col("event_id")) <= col("_fp"))
      .select(col("user_id"),
        when(col("st") === "purchase", lit("conv")).otherwise(col("st")).as("state"),
        col("ts_us"), col("event_id"), col("_fp").isNotNull.as("has_conv"))
    val pairs = marked
      .withColumn("src", coalesce(lag(col("state"), 1).over(w), lit("start")))
      .select(col("src"), col("state").as("dst"))
    val tails = marked.filter(!col("has_conv"))
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us").desc, col("event_id").desc)))
      .filter(col("_rn") === 1)
      .select(col("state").as("src"), lit("null").as("dst"))
    pairs.union(tails).groupBy(col("src"), col("dst")).agg(count(lit(1)).as("cnt"))
  }

  /** `steps` rounds of integer mass propagation; returns conv micromass. */
  private def absorbE9(
      edges: Seq[(String, String, Long)],
      out: Map[String, Long],
      steps: Int
  ): Long = {
    var mass = Map("start" -> 1000000000L).withDefaultValue(0L)
    for (_ <- 1 to steps) {
      val next = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      for ((st, m) <- mass if m != 0L) {
        if (st == "conv" || st == "null") next(st) += m
        else for ((s, d, c) <- edges if s == st) next(d) += m * c / out(s)
      }
      mass = next.toMap.withDefaultValue(0L)
    }
    mass("conv")
  }

  /** Per-channel removal-effect table. Output: `channel`, `p_full_e9`,
    * `p_removed_e9`, `removal_e9`, `share_e6` (NULL when no channel has
    * any effect).
    */
  def attribution(spark: SparkSession, ev: DataFrame, steps: Int = 8): DataFrame = {
    import spark.implicits._
    // bounded collect: ≤ (|event types| + 3)² aggregated rows
    val edges = journeyTransitions(ev).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val out = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val pFull = absorbE9(edges, out, steps)
    val removed = Channels.map { ch =>
      val kept = edges.filter { case (s, d, _) => s != ch && d != ch }
      ch -> absorbE9(kept, out, steps)
    }
    val totRe = removed.map { case (_, p) => pFull - p }.sum
    val rows = removed.map { case (ch, p) =>
      val re = pFull - p
      val share = if (totRe > 0) Some(math.floor(re.toDouble * 1e6 / totRe).toLong)
                  else None
      (ch, pFull, p, re, share)
    }
    rows.toDF("channel", "p_full_e9", "p_removed_e9", "removal_e9", "share_e6")
  }
}
