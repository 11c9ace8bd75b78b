package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic per-group caps — "domain balancing" for training corpora:
  * keep at most `n` documents per source/language/domain so no group
  * dominates the mixture, with membership that is a pure function of the
  * data (stable across runs, engines, and partitionings — the same
  * md5-ordering trick as HashSplit, where true RNG sampling would make
  * every rebuild a different dataset).
  *
  * Rows within a group are ranked by md5(id): a content-keyed
  * pseudo-random order, so the kept subset is an unbiased draw for any id
  * assignment that is independent of the features of interest. One shuffle
  * on the group key; the per-group sort is bounded by the group size (for
  * pathological hot groups, cap via [[Dedup]]-style bucket limits first or
  * pre-aggregate — row_number needs the full group on one partition).
  */
object GroupCap {

  /** Pseudo-random-but-deterministic sort key. */
  def sampleKey(id: Column): Column = md5(id.cast("string"))

  /** Keep at most `n` rows per `groupCol`, adding `samp_rank` (1-based
    * rank within the group in md5 order — exposed so downstream can
    * tighten the cap without re-shuffling).
    */
  def capPerGroup(df: DataFrame, groupCol: String, idCol: String, n: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(sampleKey(col(idCol)), col(idCol))
    df.withColumn("samp_rank", row_number().over(w))
      .filter(col("samp_rank") <= n)
  }
}
