package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * NeurIPS): score every document in a raw pool by how target-domain-like
  * its hashed n-gram profile is, then keep the top fraction. The published
  * recipe behind "train on Pile-but-Wikipedia-like" data curation;
  * reference behavior: the domain-targeted selection stage of the
  * reference's curation pipeline (the mixture/temperature operators pick
  * BETWEEN sources; DSIR picks WITHIN them).
  *
  * Features are the paper's: unigrams + bigrams hashed into B buckets
  * (md5-48 → mod B — the AbTest arm-hash spelling, engine-replayable).
  * The importance weight is the bucket-wise log-likelihood ratio of two
  * add-1-smoothed multinomials:
  *   log w(doc) = Σ_b c_b·[ln(tc_b+1) − ln(rc_b+1)] − n·[ln(T+B) − ln(R+B)]
  *
  * Determinism contract (the KMeansReplay float discipline): the per-bucket
  * λ_b = ln(tc_b+1) − ln(rc_b+1) and the global norm term are quantized to
  * INTEGER MICROS once each (floor(x·10⁶+0.5), ln replay per the
  * TfIdf/PMI precedent) — per-document scores are then exact BIGINT sums,
  * associative and partition-order-free, and selection is a total order on
  * (score, doc_id). No float is ever aggregated.
  *
  * Scale shape: two count aggregations build the bucket tables (B-row
  * bounded frames, broadcast); scoring explodes docs to gram positions,
  * maps each to its bucket λ by broadcast join, and sums integers per doc
  * — one shuffle each side, never a per-pair structure. Selection is one
  * global top-n (rank ≤ n), the same single-exchange shape as Pareto.
  */
object Dsir {

  /** Hashed feature bucket for a gram string: md5-48 mod B (the shared
    * HashSplit spelling — one deterministic-hash path through the repo).
    */
  def bucket(gram: Column, b: Int): Column = HashSplit.md548(gram) % b

  /** Unigram + bigram positions of a bound token-array column. */
  private def grams(toks: Column): Column =
    concat(toks, Repetition.bigrams(toks))

  /** (doc_id, n_grams, score_micro, selected): the importance score in
    * integer micros and the top-`keepPct`% selection flag. `targetCol`
    * marks the target-domain rows of `docs` (boolean column expression).
    */
  def importanceScores(
      docs: DataFrame,
      targetCol: Column,
      b: Int = 1024,
      keepPct: Int = 25,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val toked = docs.select(
      col(idCol), targetCol.as("_is_target"),
      TextFunctions.tokens(col(textCol)).as("_toks"))
    // one explode serves both count tables and the scoring join input.
    // persisted (MEMORY_AND_DISK): the bucket aggregate and the scoring
    // join both consume it — unpersisted, the tokenize + explode + md5
    // chain (the operator's CPU cost) ran once per consumer (r16: 5.0 s →
    // ~2 s median at sf0.1). Verify/Bench clearCache per query.
    val pos = toked
      .select(col(idCol), col("_is_target"),
        explode(grams(col("_toks"))).as("g"))
      .select(col(idCol), col("_is_target"), bucket(col("g"), b).as("bk"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // B-row bounded bucket tables: raw = the whole pool, target ⊂ raw.
    // Every bucket any doc hits appears in the raw table, so λ needs no
    // dense bucket frame — the raw rows ARE the domain.
    val counts = pos.groupBy(col("bk")).agg(
      count(lit(1)).as("rc"),
      count(when(col("_is_target"), 1)).as("tc"))
      // the totals derive from this B-row table too — never rescan the pool
      .persist()
    // quantize λ_b once per bucket — after this everything is BIGINT
    val lam = counts.select(col("bk"),
      floor((log(col("tc") + lit(1L)) - log(col("rc") + lit(1L))) * lit(1000000.0d)
        + lit(0.5d)).cast("long").as("lam_q"))
    // global norm term, quantized once: gq = floor((ln(T+B) − ln(R+B))·1e6+0.5)
    val tots = counts.agg(
      sum(col("rc")).as("r_tot"),
      sum(col("tc")).as("t_tot"))
    val gq = tots.select(
      floor((log(col("t_tot") + lit(b.toLong)) - log(col("r_tot") + lit(b.toLong)))
        * lit(1000000.0d) + lit(0.5d)).cast("long").as("gq"))
    val scored = pos
      .join(broadcast(lam), Seq("bk"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"), sum(col("lam_q")).as("s_lam"))
      .crossJoin(broadcast(gq))
      .select(col(idCol), col("n_grams"),
        (col("s_lam") - col("n_grams") * col("gq")).as("score_micro"))
    // deterministic "resampling": top keepPct% under the (score, id) total
    // order — the Gumbel top-k of the paper collapses to plain top-k once
    // the noise is dropped for replayability. Rank via the distributed
    // PrefixSum (range partitions + offset telescope), NEVER a global
    // single-partition Window.orderBy — docs are the fact table here.
    // persisted: the count probe and the ranked output both read the
    // scored rollup. Lifecycle as SubstringDedup: the returned frame
    // consumes the cache lazily; Bench/Verify clearCache per query, a
    // long-lived session should clearCache after materializing.
    val cached = scored.persist()
    val n = cached.count() // bounded driver probe; sizes keepN
    val keepN = math.max(1L, n * keepPct / 100L)
    PrefixSum.runningTotal(
      cached
        .withColumn("_negscore", -col("score_micro"))
        .withColumn("_one", lit(1L)),
      Seq("_negscore", idCol), "_one", "_rk")
      .select(col(idCol), col("n_grams"), col("score_micro"),
        (col("_rk") <= keepN).as("selected"))
  }
}
