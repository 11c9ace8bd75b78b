package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental (continuous-ingest) deduplication — the production shape
  * [[Dedup]]'s whole-corpus operators don't cover: an accepted corpus
  * already exists, a NEW batch arrives, and each batch document needs an
  * admission decision against corpus + batch without re-deduplicating the
  * corpus. Every decision is content-derived and deterministic, so re-runs
  * and re-partitionings admit the identical set.
  *
  * Decisions, in precedence order (one row per batch doc):
  *   - `corpus_exact`  — byte-identical (md5) to a corpus doc; match_id =
  *     the min-id corpus holder.
  *   - `batch_exact`   — not in the corpus, but another batch doc with the
  *     same md5 and a smaller id exists; match_id = that min id (the
  *     group's representative, whatever its own eventual fate — decisions
  *     are per-content, so a rejected representative drags its copies out
  *     with it).
  *   - `corpus_near`   — the md5-group representative whose shingle
  *     Jaccard against some corpus doc reaches `minJaccard`; match_id =
  *     the min qualifying corpus id.
  *   - `kept`          — admitted; match_id null.
  *
  * Scale shape: exact stages are equi-joins on the text md5 (one shuffle
  * each, co-partitionable with a stored corpus signature table). The near
  * stage is the [[Decontaminate]] candidate economics — explode distinct
  * shingles on both sides, equi-join on the shingle, `minShared` HAVING
  * bar — with shingles appearing in more than `maxCorpusPostings` corpus
  * docs dropped from both sides (boilerplate never generates candidates),
  * then exact-Jaccard verification on the surviving candidate pairs only.
  * Never an all-pairs join; a million-copy phrase costs one aggregate row.
  * Within-batch NEAR duplicates are out of scope (that is
  * [[Dedup.dropNearDuplicates]] over the admitted set); within-batch
  * EXACT duplicates are handled by the `batch_exact` stage.
  *
  * Output carries no floats (decisions and ids only), so the full
  * pipeline SQL-oracles without any rounding discipline.
  *
  * Reference scope: the reference dedups only whole static corpora
  * (SURVEY §2.12); this is the continuous-training-data extension.
  */
object IncrementalDedup {

  def admit(
      batch: DataFrame,
      corpus: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleW: Int = 3,
      minShared: Int = 5,
      maxCorpusPostings: Int = 20,
      minJaccard: Double = 0.5
  ): DataFrame = {
    require(minShared >= 1, "minShared must be >= 1")
    require(minJaccard > 0.0 && minJaccard <= 1.0, "minJaccard in (0, 1]")
    val id = col(idCol)
    val bH = batch.select(id, col(textCol), md5(col(textCol)).as("_h"))
    val cGroups = corpus
      .groupBy(md5(col(textCol)).as("_h")).agg(min(id).as("_c_match"))
    val s1 = bH.join(cGroups, Seq("_h"), "left")
    val bGroups = s1.filter(col("_c_match").isNull)
      .groupBy(col("_h")).agg(min(id).as("_b_rep"))
    val s2 = s1.join(bGroups, Seq("_h"), "left")
    // near stage input: one representative per novel content hash
    val reps = s2.filter(col("_c_match").isNull && id === col("_b_rep"))
      .select(id, Dedup.shingles(col(textCol), shingleW).as("_sh"))
    val corSh = corpus.select(id.as("_cid"), Dedup.shingles(col(textCol), shingleW).as("_csh"))
    val corEx = corSh.select(col("_cid"), explode(col("_csh")).as("_s"))
    val hot = corEx.groupBy(col("_s")).agg(count(lit(1)).as("_n"))
      .filter(col("_n") > maxCorpusPostings).select(col("_s"))
    val cand = reps.select(id, explode(col("_sh")).as("_s"))
      .join(hot, Seq("_s"), "left_anti")
      .join(corEx.join(hot, Seq("_s"), "left_anti"), Seq("_s"))
      .groupBy(id, col("_cid")).agg(count(lit(1)).as("_shared"))
      .filter(col("_shared") >= minShared)
    val near = cand
      .join(reps, Seq(idCol))
      .join(corSh, Seq("_cid"))
      .filter(Dedup.jaccard(col("_sh"), col("_csh")) >= minJaccard)
      .groupBy(id).agg(min(col("_cid")).as("_n_match"))
    s2.join(near, Seq(idCol), "left")
      .select(
        id,
        when(col("_c_match").isNotNull, lit("corpus_exact"))
          .when(id =!= col("_b_rep"), lit("batch_exact"))
          .when(col("_n_match").isNotNull, lit("corpus_near"))
          .otherwise(lit("kept")).as("decision"),
        when(col("_c_match").isNotNull, col("_c_match"))
          .when(id =!= col("_b_rep"), col("_b_rep"))
          .otherwise(col("_n_match")).as("match_id"))
  }
}
