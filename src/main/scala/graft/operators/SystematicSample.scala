package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Systematic PPS sampling (probability proportional to size; Madow 1949)
  * — the deterministic weighted sampler a curation pipeline uses to draw
  * a size-proportional sample (chars, tokens, bytes) with multiplicity:
  * thresholds offset + k·step (k ≥ 0) march across the cumulative-weight
  * axis, and each row is drawn once per threshold inside its weight
  * interval. Multiplicity for row i is f(cum_i) − f(cum_{i−1}) with
  * f(c) = ⌈(c − offset)/step⌉ for c > offset else 0 — counts of
  * thresholds strictly below c. With step = ⌊W/n⌋ and offset = step/2
  * the draw count is n ± 1, deterministic given the order (md5 of the
  * id, tie-broken by the id — replayable in any engine; a real survey
  * would randomize the offset, which is exactly one literal here).
  *
  * Scale shape: the global running weight goes through
  * [[PrefixSum.runningTotal]] (range partition + within-partition window
  * + broadcast offsets — never a single-partition global window); the
  * totals probe is a 1-row broadcast (the q22 pattern); the hit
  * computation is a zero-shuffle projection. All arithmetic is exact
  * BIGINT; the DIVs see non-negative operands only (the c > offset
  * guard), so Spark DIV ≡ DuckDB //.
  */
object SystematicSample {

  /** @return (id, w, cum, n_hits) for rows drawn at least once. */
  def ppsHits(
      df: DataFrame,
      weightCol: String,
      idCol: String,
      targetN: Int
  ): DataFrame = {
    require(targetN >= 1, "targetN must be positive")
    val keyed = df.select(
      col(idCol),
      col(weightCol).cast("long").as("w"),
      md5(col(idCol).cast("string")).as("ord"))
    val cum = PrefixSum.runningTotal(keyed, Seq("ord", idCol.toString), "w", "cum")
    val totals = keyed.agg(sum(col("w")).as("tw"))
      .select(col("tw"), expr(s"tw DIV $targetN").as("step"))
      .filter(col("step") >= 1L) // degenerate corpora sample nothing, loudly countable
      .withColumn("off", expr("step DIV 2"))
    cum.crossJoin(broadcast(totals))
      .withColumn("n_hits",
        expr("CASE WHEN cum > off THEN (cum - off + step - 1) DIV step ELSE 0 END") -
          expr("CASE WHEN cum - w > off THEN (cum - w - off + step - 1) DIV step ELSE 0 END"))
      .filter(col("n_hits") >= 1L)
      .select(col(idCol), col("w"), col("cum"), col("n_hits").cast("long").as("n_hits"))
  }
}
