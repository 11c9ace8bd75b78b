package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing document fingerprinting (Schleimer, Wilkerson & Aiken 2003,
  * "Winnowing: Local Algorithms for Document Fingerprinting" — the MOSS
  * algorithm): slide a window of `w` consecutive k-gram hashes over the
  * normalized text and keep each window's MINIMUM hash (rightmost position
  * on ties). The selected (hash, position) set is the document fingerprint,
  * with the paper's guarantee the sketch families here don't give:
  * any shared substring of ≥ w + k − 1 normalized chars yields at least one
  * shared fingerprint HASH — position-aware local dedup with zero false
  * negatives above the threshold, the plagiarism/code-clone detector next
  * to MinHash (set overlap) and SimHash (global distance).
  *
  * Scale shape: fingerprinting is one zero-shuffle pass — gram hashes as a
  * per-row array projection (the normalized text bound to a column FIRST so
  * the HOF lambda doesn't re-run the regex per element), a posexplode, and
  * a doc-partitioned sliding-window min; density ≈ 2/(w+1) of the gram
  * count, so the persisted fingerprint table is a small fraction of the
  * corpus. Pair detection joins on fingerprint hash with the
  * [[Dedup.minhashPairs]] hot-bucket cap — candidates only, never
  * all-pairs. Hashes are md5-32 (portable, exact DuckDB replay); hash and
  * position pack into one BIGINT key (h·2²⁴ + (2²⁴−1−pos)) so "min hash,
  * rightmost on ties" is a single integer MIN — documents are contractually
  * < 2²⁴ normalized chars (a 16 M-char doc needs PosBits widened).
  */
object Winnow {

  val DefaultK = 5
  val DefaultW = 8
  private val PosBits = 24
  private val PosMask = (1L << PosBits) - 1L

  /** MOSS normalization: case-fold and strip everything but alphanumerics,
    * so whitespace/punctuation edits can't dodge the detector.
    */
  def normalize(text: Column): Column =
    regexp_replace(lower(text), "[^a-z0-9]", "")

  /** One fingerprint row per selected (doc, hash, position) — the table a
    * dedup deployment persists. Documents shorter than k normalized chars
    * contribute nothing.
    */
  def fingerprints(
      df: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      k: Int = DefaultK,
      w: Int = DefaultW
  ): DataFrame = {
    require(k == DefaultK, "the native gram kernel and the SQL replay are pinned to k = 5")
    // gram hashes via the native one-pass kernel (expressions.GramHash) —
    // bit-identical to the HOF transform spelling, and immune to the
    // CollapseProject hazard where the lambda's inlined normalize regex
    // re-ran per gram (O(len²) per doc — 19 s at sf0.1 before r16's fix)
    val grams = df
      .select(col(idCol).as("doc_id"), normalize(col(textCol)).as("s"))
      .filter(length(col("s")) >= k)
      .select(col("doc_id"),
        posexplode(graft.expressions.GramHash.grams(col("s"), k)).as(Seq("pos0", "h")))
      .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("h"))
    val combined = col("h") * lit(1L << PosBits) + (lit(PosMask) - col("pos"))
    val frame = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(-(w - 1), 0)
    grams
      .withColumn("fpkey", min(combined).over(frame))
      .filter(col("pos") >= w) // full windows only
      .select(col("doc_id"), col("fpkey"))
      .distinct()
      .select(
        col("doc_id"),
        shiftright(col("fpkey"), PosBits).as("fp_hash"),
        (lit(PosMask) - col("fpkey").bitwiseAND(lit(PosMask))).as("fp_pos"))
  }

  /** Candidate near-dup pairs: documents sharing ≥ `minShared` distinct
    * fingerprint hashes. Hashes shared by more than `maxBucketSize` docs
    * are dropped before the equi-join — and unlike the MinHash/SimHash
    * band caps (where hot buckets are anomalies), ubiquity is STRUCTURAL
    * here: common-language k-grams with small hash values get selected as
    * fingerprints in thousands of documents, and each such hash costs
    * C(bucket, 2) pairs (55 s at sf0.1 under a 10 000 cap — quadratic at
    * corpus scale). MOSS's published practice is exactly this cut: ignore
    * fingerprints appearing in many documents (template/boilerplate
    * matches aren't plagiarism signal). The winnowing guarantee this
    * operator trades on — a shared RARE run yields a shared fingerprint —
    * survives, which the planted-copy oracle proves.
    */
  def candidatePairs(
      fps: DataFrame,
      minShared: Int = 3,
      maxBucketSize: Int = 100
  ): DataFrame = {
    val byHash = fps
      .select(col("doc_id"), col("fp_hash"))
      .distinct()
      .withColumn("bn", count(lit(1)).over(Window.partitionBy(col("fp_hash"))))
      .filter(col("bn") <= maxBucketSize)
      .drop("bn")
    val l = byHash.select(col("fp_hash"), col("doc_id").as("id1"))
    val r = byHash.select(col("fp_hash"), col("doc_id").as("id2"))
    l.join(r, Seq("fp_hash"))
      .filter(col("id1") < col("id2"))
      .groupBy(col("id1"), col("id2"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
