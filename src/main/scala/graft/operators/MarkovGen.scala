package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic synthetic-sequence generation from the observed Markov
  * chain — the SYNTHESIS stage of a curation pipeline (augmenting sparse
  * behavioral data, building load-test corpora) made replayable: each
  * seed walks `steps` transitions, and step t's draw is inverse-CDF
  * sampling with md5 in place of an engine RNG — the integer md5-48 of
  * "g <key> <t>" reduced mod the current state's outgoing count and
  * bucketed against the cumulative transition counts (next states in
  * lexicographic order). Every quantity is an exact integer, so both
  * engines replay every draw bit-for-bit (the q_knn_lsh
  * literal-randomness recipe applied to sampling).
  *
  * Scale shape: the transition matrix is ≤ |states|² rows — broadcast;
  * each step is one broadcast non-equi join (cum-bucket bounds, k-row
  * side: the q22 pattern) over the seed frame; `steps` is a literal, so
  * the plan is a fixed chain of `steps` tiny joins. No RNG, no state,
  * no shuffle beyond the transition aggregate.
  */
object MarkovGen {

  /** @param df     (keyCol, stateCol, tsCol, tieCol) event rows.
    * @param steps  transitions to walk per seed (plan size is linear in it).
    * @return (key, step, state): step 0 is the seed (each key's FIRST
    *         observed state), steps 1..n the generated walk. A state with
    *         no observed outgoing transition ends its walk early (inner
    *         join against the matrix — deterministic truncation).
    */
  def generate(
      df: DataFrame,
      steps: Int,
      keyCol: String = "user_id",
      stateCol: String = "event_type",
      tsCol: String = "ts_us",
      tieCol: String = "event_id"
  ): DataFrame = {
    require(steps >= 1 && steps <= 16, s"steps=$steps out of the literal-plan range")
    val trans = Markov.transitions(df, keyCol, stateCol, tsCol, tieCol)
    val cumW = Window.partitionBy(col("cur")).orderBy(col("next"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = trans
      .withColumn("hi", sum(col("n")).over(cumW).cast("long"))
      .withColumn("lo", (col("hi") - col("n")).cast("long"))
      .select(col("cur"), col("next"), col("n_from"), col("lo"), col("hi"))
    val seedW = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val seeds = df
      .select(col(keyCol), col(stateCol).as("state"), col(tsCol), col(tieCol))
      .withColumn("_rn", row_number().over(seedW))
      .filter(col("_rn") === 1)
      .select(col(keyCol), col("state"))
    val walk = (1 to steps).scanLeft(seeds) { (prev, t) =>
      val h = graft.operators.HashSplit.md548(
        concat(lit("g "), col(keyCol).cast("string"), lit(" "), lit(t.toString)))
      prev.join(broadcast(cum),
          col("state") === col("cur") &&
            (h % col("n_from")) >= col("lo") && (h % col("n_from")) < col("hi"))
        .select(col(keyCol), col("next").as("state"))
    }
    walk.zipWithIndex
      .map { case (g, t) =>
        g.select(col(keyCol), lit(t.toLong).as("step"), col("state"))
      }
      .reduce(_ unionByName _)
  }
}
