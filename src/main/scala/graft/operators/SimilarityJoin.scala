package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact set-similarity self-join via prefix filtering — the
  * AllPairs/PPJoin family (Bayardo 2007, Xiao 2008): every pair with
  * shingle-set Jaccard ≥ τ, with NO false negatives (the guarantee
  * MinHash-LSH banding trades away) and still never an all-pairs join.
  *
  * The filter: order every document's shingles by a single global order —
  * rarest-first (document frequency asc, shingle asc) — and keep only the
  * PREFIX of length |x| − ⌈τ·|x|⌉ + 1. If J(A,B) ≥ τ then
  * |A∩B| ≥ τ·max(|A|,|B|), so the matching elements cannot all hide in
  * either suffix: qualifying pairs MUST share a prefix element (Xiao 2008
  * Lemma 1), and the candidate join on prefix shingles is exhaustive.
  * Rarest-first ordering makes prefixes meet on LOW-df shingles, so the
  * equi-join fan-out is bounded by rare-token posting lists, not the hot
  * head. A size filter (τ·|A| ≤ |B| ≤ |A|/τ, ε-slack so float rounding
  * can never drop a boundary pair) prunes candidates before the exact
  * verify.
  *
  * Scale shape: shingle df is one aggregate; the per-doc rank window
  * partitions by document (bounded by doc shingle count); candidates come
  * from the prefix-prefix equi-join (rare postings); the exact
  * |A∩B|/|A∪B| verify joins shingle arrays for CANDIDATES only. At 100 TB
  * the verify join ships arrays only for pairs that survived both filters
  * — the same economics as [[Dedup.nearDuplicates]]' verify stage, with
  * exactness instead of signature recall.
  *
  * Numeric discipline: df, ranks, sizes, intersections are exact
  * integers; Jaccard is one division of exact integers (identical IEEE on
  * both engines); the τ comparison happens on that exact value.
  */
object SimilarityJoin {

  /** @return (id1, id2, jaccard) for every pair with Jaccard ≥ threshold,
    *         id1 < id2; jaccard exact (not rounded — integer ratio).
    */
  def jaccardSelfJoin(
      docs: DataFrame,
      threshold: Double,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleWidth: Int = 3
  ): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"SimilarityJoin.jaccardSelfJoin: threshold must be in (0, 1], got $threshold")
    // The shingled corpus feeds FOUR consumers (sizes, the df explode and
    // both verify sides) and the prefix feeds both sides of the candidate
    // self-join — persist them or Spark re-tokenizes the corpus per
    // consumer. Reproduced r11: 2.2–2.6 s at sf0.1 with the persists
    // (TimeQ isolation AND a REPS=3 sequential full-Bench median) vs
    // ~11 s without (r9); the 14.4 s in BENCH_r10.json was gate-host
    // load, not a cache race. Same phantom again in BENCH_r17 (driver
    // median 2.33 -> 10.05 s on byte-identical code): r18 TimeQ isolation
    // at sf0.1 re-measured 2.09-3.55 s over 5 reps (median 2.43), and the
    // whole r17 watch list (q_minhash_md5_sigs, q_knn_pq, q_kcore,
    // q_community_quality) sat at ~half its driver numbers in the same
    // session — a uniform ambient-load factor, not a persist-lifecycle
    // leak. The full-JVM hypothesis was ALSO tested: an r18 driver-style
    // full 324-query bench (same JVM, same clearCache discipline) ran
    // this query at 3.58 s one-shot — no eviction/GC pressure effect
    // either. MEMORY_AND_DISK default spills rather than
    // OOMs at scale. Lifecycle: the blocks live until the session drops
    // them — Bench/Verify clearCache() per query; a long-lived session
    // should clearCache (or unpersist these) after materializing the
    // result, since the returned frame consumes them lazily.
    val sh = docs.select(col(idCol).as("id"),
      Dedup.shingles(col(textCol), shingleWidth).as("sh")).persist()
    val sized = sh.select(col("id"), col("sh"), size(col("sh")).as("n"))
    val ex = sh.select(col("id"), explode(col("sh")).as("s"))
    val dfreq = ex.groupBy(col("s")).agg(count(lit(1)).as("df"))

    val rk = ex
      .join(dfreq, Seq("s"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("df"), col("s"))))
    val pref = rk
      .join(sized.select(col("id"), col("n")), Seq("id"))
      .filter(col("rn") <= col("n") - ceil(lit(threshold) * col("n")) + 1)
      .select(col("id"), col("s"), col("n"))
      .persist()

    val cand = pref.as("a")
      .join(pref.as("b"),
        col("a.s") === col("b.s") && col("b.id") > col("a.id") &&
          col("b.n") >= lit(threshold) * col("a.n") - lit(1e-9) &&
          col("b.n") <= col("a.n") / lit(threshold) + lit(1e-9))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()

    cand
      .join(sh.select(col("id").as("id1"), col("sh").as("sh1")), Seq("id1"))
      .join(sh.select(col("id").as("id2"), col("sh").as("sh2")), Seq("id2"))
      .select(col("id1"), col("id2"),
        Dedup.jaccard(col("sh1"), col("sh2")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
