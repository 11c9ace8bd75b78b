package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Greedy facility-location data selection — the submodular coreset
  * selector (Wolsey 1982 greedy; the CRAIG / "submodular data subset
  * selection" recipe) that picks `k` exemplar documents maximizing total
  * corpus coverage
  *
  *   F(S) = Σ_v max_{c ∈ S} sim(v, c)
  *
  * — the max-SUM complement of [[KCenter]]'s max-MIN: k-center spreads
  * picks to bound the worst case, facility location weights picks by how
  * much of the corpus they REPRESENT (the mixture-curation question:
  * "which k docs best stand in for the rest?"). Greedy is (1 − 1/e)
  * optimal for this monotone submodular objective — the standard practice.
  *
  * Determinism contract: coordinates quantize to integer micros
  * ([[KMeansReplay.quantize]]'s spelling), similarities are the floor-6
  * cosine of exact-BIGINT dot/norm sums (the kNN-oracle spelling), and
  * from there EVERYTHING is integer arithmetic — marginal gains are
  * BIGINT sums of `max(s − best, 0)`, the argmax tie-breaks on candidate
  * id, and round-i coverage = Σ gains ≤ i exactly. The whole k-round
  * greedy hash-replays as unrolled SQL.
  *
  * Scale shape: the candidate pool is a bounded stride (`candEvery`; a
  * production run feeds a pre-sampled pool) broadcast against the corpus,
  * so each of the k rounds is two linear passes over the (corpus ×
  * candidates) pair stream — one for best-so-far (chosen side only), one
  * for gains — with map-side integer combines; nothing pairwise in the
  * corpus, no global sort (argmax = TakeOrdered 1), and the driver holds
  * exactly k chosen rows ([[KMeansReplay]]'s bounded-state discipline).
  *
  * Reference scope: no counterpart (the reference has no data-selection
  * step); SURVEY §2.12 extension, family of [[KCenter]], [[Mmr]],
  * [[SemanticDedup]].
  */
object FacilitySelect {

  /** Greedy-select `k` exemplars from the `vec_id % candEvery = 0 AND
    * vec_id < candMax` candidate pool: (sel_rank, vec_id, gain_e6,
    * coverage_e6) — one row per round, gains the exact marginal coverage
    * in cosine-micros. The `candMax` id cap makes the pool a FIXED
    * pre-sampled set however large the corpus grows (candidates bounded ⇒
    * the pair stream stays linear in corpus rows — without it the stride
    * alone would grow the pool with the data and the rounds quadratically).
    */
  def greedy(
      spark: SparkSession,
      emb: DataFrame,
      k: Int = 8,
      candEvery: Int = 16,
      candMax: Long = 2048L,
      dims: Int = 64,
      vecCol: String = "embedding"
  ): DataFrame = {
    import spark.implicits._
    val q = KMeansReplay.quantize(emb, vecCol, dims)
      .withColumn("nrm", graft.functions.VectorFunctions.dotLong(col("xq"), col("xq")))
    val cand = broadcast(
      q.filter(col("vec_id") % candEvery === 0 && col("vec_id") < candMax)
        .select(col("vec_id").as("c"), col("xq").as("cx"), col("nrm").as("cn")))
    // floor-6 cosine of exact integer sums; zero-norm rows can't cover or
    // be covered (s := 0 drops below the s > 0 support filter)
    val dp = graft.functions.VectorFunctions.dotLong(col("xq"), col("cx"))
    // the 2k round aggregations re-read this pair stream — persist it
    // ONCE (64-dim cosines are the dominant cost; without the cache the
    // k rounds re-run the quantize+dot 2k times: 17 s → ~2 s at sf0.1)
    val pairs = q
      .crossJoin(cand)
      .select(col("vec_id").as("v"), col("c"),
        when(col("nrm") > 0L && col("cn") > 0L,
          floor(dp.cast("double") / sqrt(col("nrm").cast("double"))
            / sqrt(col("cn").cast("double")) * lit(1000000.0) + lit(0.5))
            .cast("long"))
          .otherwise(lit(0L)).as("s"))
      .filter(col("s") > 0L)
      .persist()

    var chosen = Vector.empty[(Long, Long)] // (vec_id, gain_e6)
    try {
      var r = 0
      while (r < k) {
        val ids = chosen.map(_._1)
        val gains =
          if (ids.isEmpty) pairs.select(col("c"), col("s").as("g"))
          else {
            val best = pairs.filter(col("c").isin(ids: _*))
              .groupBy(col("v")).agg(max(col("s")).as("best"))
            pairs.filter(!col("c").isin(ids: _*))
              .join(best, Seq("v"), "left")
              .select(col("c"),
                greatest(col("s") - coalesce(col("best"), lit(0L)), lit(0L)).as("g"))
          }
        val top = gains.groupBy(col("c")).agg(sum(col("g")).as("gain"))
          .orderBy(col("gain").desc, col("c")).limit(1)
          .as[(Long, Long)].collect()
        if (top.isEmpty) r = k // candidate pool exhausted — stop
        else {
          chosen :+= top(0)
          r += 1
        }
      }
    } finally pairs.unpersist(blocking = false)
    val rows = chosen.zipWithIndex.map { case ((c, g), i) =>
      (i + 1L, c, g, chosen.take(i + 1).map(_._2).sum)
    }
    rows.toDF("sel_rank", "vec_id", "gain_e6", "coverage_e6")
  }
}
