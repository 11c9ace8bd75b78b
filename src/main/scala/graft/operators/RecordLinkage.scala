package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi–Sunter record linkage (Fellegi & Sunter 1969) — the entity-
  * resolution pass a training-data pipeline runs to merge user/author/
  * source records before per-entity aggregation or dedup: candidate
  * pairs come from BLOCKING (an equi-join on coarse keys — never an
  * all-pairs comparison), each pair gets a per-field agreement vector,
  * and the match score is the sum of per-field log-odds weights
  * (log m/u for agreement, log (1−m)/(1−u) for disagreement). Weights
  * are FIXED literal integers in milli-units — the classic production
  * setup where m/u are estimated offline — so the whole score is exact
  * BIGINT arithmetic and the pipeline hash-oracles cross-engine.
  *
  * Scale shape: one shuffle per side on the block key; hot blocks are
  * capped (the LSH maxBucketSize economics — bounded recall loss, never
  * a runaway quadratic join); the agreement projection is zero-shuffle;
  * classification is a per-row CASE. Blocking recall loss is a REPORTED
  * quantity, not a silent one ([[q_linkage_quality]] counts plants whose
  * perturbed block key removed them from candidacy).
  */
object RecordLinkage {

  /** One scored field: agreement adds `agreeMilli`, disagreement adds
    * `disagreeMilli` (both log-odds × 1000, agree > 0 > disagree).
    */
  final case class Field(name: String, agreeMilli: Long, disagreeMilli: Long)

  /** Candidate pairs by blocking: a × b equi-joined on `blockCols`, each
    * side's blocks capped at `maxBlockSize` rows (oversized blocks are
    * dropped whole — bounded loss, never an OOM join). `a` and `b` must
    * carry disjoint non-block column names.
    */
  def blockPairs(
      a: DataFrame,
      b: DataFrame,
      blockCols: Seq[String],
      maxBlockSize: Int = 10000
  ): DataFrame = {
    require(blockCols.nonEmpty, "blocking requires at least one key column")
    Buckets.cap(a, blockCols, maxBlockSize)
      .join(Buckets.cap(b, blockCols, maxBlockSize), blockCols)
  }

  /** Score blocked pairs: each `(field, agreementPredicate)` contributes
    * its agree/disagree milli-weight; emits one `agr_<name>` boolean per
    * field plus `score_milli`.
    */
  def score(pairs: DataFrame, fields: Seq[(Field, Column)]): DataFrame = {
    require(fields.nonEmpty, "at least one scored field")
    val flagged = fields.foldLeft(pairs) { case (df, (f, pred)) =>
      df.withColumn(s"agr_${f.name}", pred)
    }
    val total = fields.map { case (f, _) =>
      when(col(s"agr_${f.name}"), lit(f.agreeMilli)).otherwise(lit(f.disagreeMilli))
    }.reduce(_ + _)
    flagged.withColumn("score_milli", total.cast("long"))
  }

  /** Fellegi–Sunter three-way decision on the scored pairs: match at or
    * above `upperMilli`, nonmatch at or below `lowerMilli`, clerical
    * review between.
    */
  def classify(scored: DataFrame, upperMilli: Long, lowerMilli: Long): DataFrame = {
    require(lowerMilli < upperMilli, "lower threshold must sit below upper")
    scored.withColumn("decision",
      when(col("score_milli") >= upperMilli, lit("match"))
        .when(col("score_milli") <= lowerMilli, lit("nonmatch"))
        .otherwise(lit("review")))
  }

  /** Cross-engine-safe cents spelling for money comparators:
    * floor(x·100 + 0.5) is pure IEEE (×, +, floor are bit-defined), so
    * Spark and DuckDB agree bit-for-bit where library round() may not.
    */
  def cents(x: Column): Column = floor(x * lit(100.0d) + lit(0.5d)).cast("long")
}
