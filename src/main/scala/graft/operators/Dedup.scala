package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deduplication for large text corpora: exact, MinHash-LSH, SimHash, and
  * n-gram Jaccard verification. Everything is pure Catalyst expressions plus
  * shuffle-side DataFrame ops (explode → groupBy/join), so the work
  * distributes: no signature matrix ever sits on the driver.
  *
  * Scale shape (per 100 TB corpus):
  *   exact:    one shuffle on a 128-bit content hash.
  *   minhash:  linear scan to signatures (narrow), explode to `bands` rows
  *             per doc (small constant), shuffle on (band, bandHash) — only
  *             bucket-mates ever meet; skewed mega-buckets are AQE-split and
  *             further bounded by `maxBucketSize`.
  *   simhash:  linear signatures, shuffle on 16-bit chunks (4 rows/doc).
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact duplicate groups keyed by md5 of the raw text. Returns one row per
    * distinct text: representative (min) id, copy count.
    */
  def exactGroups(df: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_md5"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  /** Keep one row per distinct text (the min-id representative). */
  def dropExactDuplicates(df: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    df.join(
      exactGroups(df, textCol, idCol).select(col(idCol)),
      Seq(idCol),
      "left_semi"
    )

  /** Streaming twin of [[dropExactDuplicates]]: first-seen wins per content
    * hash, with state bounded by the event-time watermark (two rows more
    * than `delay` apart are allowed to both survive — the price of bounded
    * state on an unbounded stream). Call on a streaming frame before its
    * aggregation/sink stage.
    */
  def dropExactDuplicatesStream(
      df: DataFrame,
      tsCol: String,
      delay: String = "10 minutes",
      textCol: String = "text"
  ): DataFrame =
    df.withColumn("text_md5", md5(col(textCol)))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("text_md5")
      .drop("text_md5")

  // ------------------------------------------------------------- shingles

  /** Word w-shingles (default w=3), distinct, lowercased. Documents shorter
    * than w words get a single shingle = the whole normalized text, so they
    * still participate. Native one-pass kernel — the columnar spelling
    * (transform + slice + array_join per position + array_distinct) was the
    * dominant cost of the shingle-verify joins; `shinglesColumnar` keeps it
    * as the cross-implementation oracle for the equivalence spec.
    */
  def shingles(text: Column, w: Int = 3): Column =
    graft.expressions.TextSketches.shingleSet(text, w)

  private[graft] def shinglesColumnar(text: Column, w: Int = 3): Column = {
    val toks = TextFunctions.tokens(text)
    val joined = array_join(toks, " ")
    array_distinct(
      when(size(toks) < w, array(joined))
        .otherwise(
          transform(
            sequence(lit(0), size(toks) - w),
            i => array_join(slice(toks, i + 1, lit(w)), " ")
          )
        )
    )
  }

  /** Exact Jaccard similarity of two set columns (elements distinct, as
    * [[shingles]] guarantees). |a∪b| is computed as |a|+|b|−|a∩b| — the
    * union array is never materialized, halving the per-pair hash work in
    * the verify joins (codegen CSEs the repeated intersect reference).
    */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    val union = size(a) + size(b) - inter
    when(union === 0, lit(0.0)).otherwise(inter.cast("double") / union)
  }

  // -------------------------------------------------------------- minhash

  /** MinHash signature (array<long>, length nPerms) of the text — one-pass
    * native expression (see expressions.TextSketches for why not 32
    * columnar `transform` passes).
    */
  def minhashSignature(text: Column, nPerms: Int = 32, seed: Long = 42L,
      stopHashes: Array[Long] = Array.empty): Column =
    graft.expressions.TextSketches.minhashSignature(text, nPerms, seed = seed,
      stopHashes = stopHashes)

  /** Hashes (mod the sketch prime) of shingles appearing in more than
    * `maxDocFrac` of documents — boilerplate headers/footers/licenses. The
    * result is driver-collected but bounded: at most
    * avgShinglesPerDoc / maxDocFrac entries can exceed the frequency bar
    * (each doc contributes each shingle once), so with maxDocFrac ≥ 0.05
    * this is thousands of longs, not a vocabulary.
    */
  def hotShingleHashes(
      df: DataFrame,
      textCol: String = "text",
      maxDocFrac: Double = 0.1,
      w: Int = 3
  ): Array[Long] = {
    require(maxDocFrac >= 0.01, "maxDocFrac < 1% would unbound the stoplist")
    val nDocs = df.count()
    df.select(explode(shingles(col(textCol), w)).as("sh"))
      .groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDocFrac * nDocs)
      .select(pmod(xxhash64(col("sh")), lit(graft.expressions.TextSketches.SketchPrime)).as("h"))
      .collect().map(_.getLong(0))
  }

  /** Candidate near-duplicate pairs via LSH banding + exact-Jaccard verify.
    *
    * Docs whose signatures agree on all rows of ≥1 band meet in a bucket;
    * each bucket self-joins (id1 < id2), then pairs are verified with exact
    * shingle-set Jaccard and filtered at `threshold`.
    *
    * @param maxBucketSize degenerate buckets (boilerplate corpora) are capped
    *        to bound the quadratic bucket join; dropped buckets mean recall
    *        loss, logged by the caller, never OOM.
    * @param stopShingleDocFrac when set, shingles appearing in more than
    *        this fraction of documents are excluded from SIGNATURES (not
    *        from the exact-Jaccard verify): boilerplate shingles otherwise
    *        dominate every lane's min and band unrelated docs together.
    */
  def minhashPairs(
      df: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      nPerms: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.8,
      seed: Long = 42L,
      maxBucketSize: Int = 10000,
      stopShingleDocFrac: Option[Double] = None
  ): DataFrame = {
    require(nPerms % bands == 0, "bands must divide nPerms")
    val rowsPerBand = nPerms / bands
    val stop: Array[Long] =
      stopShingleDocFrac.map(f => hotShingleHashes(df, textCol, f)).getOrElse(Array.empty)

    // Narrow banded frame: (id, band, band_hash) only — shingle arrays stay
    // out of the bucket shuffle entirely.
    val banded = df
      .select(col(idCol),
        posexplode(
          bandHashes(minhashSignature(col(textCol), nPerms, seed, stop), bands, rowsPerBand)
        ).as(Seq("band", "band_hash")))

    val bounded = Buckets.cap(banded, Seq("band", "band_hash"), maxBucketSize)

    // Candidate pairs deduped BEFORE the (expensive) exact-Jaccard verify:
    // a pair agreeing on k bands would otherwise be verified k times, with
    // its shingle arrays shuffled k times.
    val cand = bounded
      .select(col("band"), col("band_hash"), col(idCol).as("id1"))
      .join(
        bounded.select(col("band"), col("band_hash"), col(idCol).as("id2")),
        Seq("band", "band_hash"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"))
      .distinct()

    // Signature-estimate prefilter: the fraction of agreeing minhash lanes is
    // an unbiased Jaccard estimator (σ = sqrt(j(1−j)/nPerms)); candidates
    // estimating below threshold − 2σ cannot plausibly verify, so they skip
    // the exact set-intersection entirely. Signatures are nPerms longs — far
    // narrower than the shingle arrays the verify join ships. Only engaged
    // when the slack leaves something to prune.
    val slack = 2.0 * math.sqrt(threshold * (1 - threshold) / nPerms)
    val prefiltered = if (threshold - slack > 0.05) {
      val sigNarrow = df.select(col(idCol), minhashSignature(col(textCol), nPerms, seed, stop).as("sig"))
      val laneAgreement = size(filter(
        zip_with(col("sig1"), col("sig2"), (a, b) => a === b), x => x))
        .cast("double") / nPerms
      cand
        .join(sigNarrow.select(col(idCol).as("id1"), col("sig").as("sig1")), Seq("id1"))
        .join(sigNarrow.select(col(idCol).as("id2"), col("sig").as("sig2")), Seq("id2"))
        .filter(laneAgreement >= threshold - slack)
        .select(col("id1"), col("id2"))
    } else cand

    val sh = df.select(col(idCol), shingles(col(textCol)).as("sh"))
    prefiltered
      .join(sh.select(col(idCol).as("id1"), col("sh").as("sh1")), Seq("id1"))
      .join(sh.select(col(idCol).as("id2"), col("sh").as("sh2")), Seq("id2"))
      .select(col("id1"), col("id2"), jaccard(col("sh1"), col("sh2")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Per-band hashes of a minhash signature: band b hashes rows
    * [b·r, (b+1)·r) of the signature array.
    */
  private def bandHashes(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      xxhash64(concat_ws(",", slice(sig, b * rowsPerBand + 1, rowsPerBand)))
    }: _*)

  /** Portable twin of [[minhashPairs]] over the md5-48 lane signatures
    * (expressions.Md5MinHash — the q_minhash_md5_sigs sketch): 16 lanes
    * banded 4×4, band keys the comma-joined EXACT lane values (no engine
    * band hash anywhere), candidates verified with exact shingle-set
    * Jaccard. Every stage — lanes, banding, bucket cap, verify — is
    * deterministic integer/md5 arithmetic, so the PAIR OUTPUT itself
    * hash-oracles cross-engine (the q_knn_lsh restate recipe); the
    * xxhash64 [[minhashPairs]] stays the fast intra-Spark default.
    * Same scale shape: one signature scan, shuffle on (band, key),
    * shingle arrays shipped only for surviving candidates.
    */
  def minhashPairsMd5(
      df: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      threshold: Double = 0.05,
      bands: Int = 4,
      maxBucketSize: Int = 10000
  ): DataFrame = {
    val nLanes = 16
    require(bands > 0 && nLanes % bands == 0, s"bands=$bands must divide $nLanes")
    val r = nLanes / bands
    // shingles feed the lane kernel and both verify sides — persist, the
    // minhashPairs/PPJoin discipline (harness clears caches per query)
    val sh = df.select(col(idCol).as("id"), shingles(col(textCol)).as("sh")).persist()
    val keyed = sh
      .select(col("id"), graft.expressions.Md5MinHash.lanes(col("sh"), nLanes).as("_mh"))
      .select(col("id"),
        posexplode(array((0 until bands).map { b =>
          concat_ws(",", (0 until r).map(j =>
            element_at(col("_mh"), b * r + j + 1).cast("string")): _*)
        }: _*)).as(Seq("band", "key")))
    val bounded = Buckets.cap(keyed, Seq("band", "key"), maxBucketSize)
    val cand = bounded.select(col("band"), col("key"), col("id").as("id1"))
      .join(bounded.select(col("band"), col("key"), col("id").as("id2")),
        Seq("band", "key"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"))
      .distinct()
    cand
      .join(sh.select(col("id").as("id1"), col("sh").as("sh1")), Seq("id1"))
      .join(sh.select(col("id").as("id2"), col("sh").as("sh2")), Seq("id2"))
      .select(col("id1"), col("id2"), jaccard(col("sh1"), col("sh2")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Portable twin of [[simhashPairs]] over the 48-bit md5 SimHash
    * (functions.TextFunctions.simhash48FromHashes — the q_simhash_md5
    * sketch): 4×12-bit chunks, so ALL pairs within Hamming distance 3 are
    * found exactly (pigeonhole: ≤3 differing bits leave ≥1 chunk intact)
    * — complete recall, not a candidate heuristic, which is what makes
    * the output a clean cross-engine contract. Pairs are emitted with
    * their exact Hamming distance; everything is integer arithmetic over
    * md5, so the output hash-oracles. The 64-bit xxhash [[simhashPairs]]
    * stays the fast intra-Spark default (and reaches wider distances).
    */
  def simhashPairsMd5(
      df: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      maxHamming: Int = 3,
      maxBucketSize: Int = 10000
  ): DataFrame = {
    require(maxHamming <= 3,
      s"4x12-bit chunking guarantees complete recall only to Hamming 3, got $maxHamming")
    // (id, sig) is two longs per doc — persist so the self-join's two
    // sides don't each re-run the 48 bit-folds over the token hashes
    val sigs = df
      .select(col(idCol).as("id"),
        graft.functions.TextFunctions.md548Tokens(col(textCol)).as("_hs"))
      .select(col("id"),
        graft.functions.TextFunctions.simhash48FromHashes(col("_hs")).as("sig"))
      .persist()
    val chunked = sigs.select(
      col("id"), col("sig"),
      posexplode(array((0 until 4).map(c =>
        shiftrightunsigned(col("sig"), c * 12) % 4096L): _*))
        .as(Seq("chunk", "chunk_val")))
    val bounded = Buckets.cap(chunked, Seq("chunk", "chunk_val"), maxBucketSize)
    val l = bounded.select(col("chunk"), col("chunk_val"), col("id").as("id1"), col("sig").as("s1"))
    val rr = bounded.select(col("chunk"), col("chunk_val"), col("id").as("id2"), col("sig").as("s2"))
    l.join(rr, Seq("chunk", "chunk_val"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), bit_count(col("s1").bitwiseXOR(col("s2"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .groupBy(col("id1"), col("id2"))
      .agg(min(col("hamming")).as("hamming"))
  }

  /** Near-dedup: drop the higher-id member of every verified near-dup pair. */
  def dropNearDuplicates(
      df: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      threshold: Double = 0.8
  ): DataFrame = {
    val losers = minhashPairs(df, textCol, idCol, threshold = threshold)
      .select(col("id2").as(idCol))
      .distinct()
    df.join(losers, Seq(idCol), "left_anti")
  }

  // -------------------------------------------------------------- simhash

  /** 64-bit SimHash over token hashes (Charikar 2002): bit j of the result is
    * the sign of Σ_tokens (±1 for bit j of xxhash64(token)). Near-identical
    * token multisets land within a small Hamming distance. One-pass native
    * expression (expressions.SimHash64).
    */
  def simhash(text: Column): Column =
    graft.expressions.TextSketches.simhash64(text)

  /** Candidate pairs within `maxHamming` of each other, found by chunking the
    * 64-bit simhash into 4×16-bit keys (pigeonhole: pairs ≤3 bits apart share
    * ≥1 exact chunk; wider distances need more chunks/probes).
    *
    * @param maxBucketSize boilerplate corpora pile thousands of docs onto one
    *        chunk value (near-zero simhash chunks), turning the bucket
    *        self-join quadratic; oversized buckets are dropped — bounded
    *        recall loss, never a runaway join (same cap as [[minhashPairs]]).
    */
  def simhashPairs(
      df: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      maxHamming: Int = 3,
      maxBucketSize: Int = 10000
  ): DataFrame = {
    val sigs = df.select(col(idCol), simhash(col(textCol)).as("simhash"))
    val chunked = sigs.select(
      col(idCol),
      col("simhash"),
      posexplode(
        array((0 until 4).map(c => shiftrightunsigned(col("simhash"), c * 16) % 65536L): _*)
      ).as(Seq("chunk", "chunk_val"))
    )
    val bounded = Buckets.cap(chunked, Seq("chunk", "chunk_val"), maxBucketSize)
    val l = bounded.select(col("chunk"), col("chunk_val"), col(idCol).as("id1"), col("simhash").as("sh1"))
    val r = bounded.select(col("chunk"), col("chunk_val"), col(idCol).as("id2"), col("simhash").as("sh2"))
    l.join(r, Seq("chunk", "chunk_val"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), bit_count(col("sh1").bitwiseXOR(col("sh2"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .groupBy(col("id1"), col("id2"))
      .agg(min(col("hamming")).as("hamming"))
  }
}
