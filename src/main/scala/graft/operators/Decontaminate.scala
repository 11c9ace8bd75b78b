package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the training-data hygiene step that keeps
  * evaluation sets meaningful: find (and drop) training documents that
  * share at least `minShared` distinct word w-shingles with any benchmark
  * document (n-gram-overlap decontamination, the method used for the
  * GPT-3/C4-era training corpora).
  *
  * Scale shape: both sides explode to (id, shingle) and equi-join on the
  * shingle — never an all-pairs document join. The benchmark side is tiny
  * relative to a training corpus (thousands vs billions of docs), so it is
  * broadcast; per-shingle fan-out is bounded by the benchmark's shingle
  * multiplicity. The training corpus streams through map-side: one scan,
  * one shuffle for the (doc, bench) overlap count.
  */
object Decontaminate {

  /** (doc_id, bench_id, n_shared) for every training×benchmark pair with
    * `n_shared >= minShared` distinct shingles in common. Shingles come
    * from [[Dedup.shingles]] (distinct per doc), so a plain count is the
    * distinct-overlap count.
    */
  def overlaps(
      train: DataFrame,
      bench: DataFrame,
      minShared: Int = 5,
      w: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val t = train.select(col(idCol).as("doc_id"),
      explode(Dedup.shingles(col(textCol), w)).as("sh"))
    val b = bench.select(col(idCol).as("bench_id"),
      explode(Dedup.shingles(col(textCol), w)).as("sh"))
    t.join(broadcast(b), Seq("sh"))
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** [[overlaps]] for a benchmark suite too large to broadcast as a hash
    * relation: a Bloom filter over the benchmark's shingle hashes is ~10
    * bits per shingle (vs ~100+ bytes per entry in a broadcast hash map —
    * two orders of magnitude smaller for the same membership question), so
    * the might-contain prefilter still runs MAP-SIDE over the training
    * corpus, and only the surviving ~fpp fraction of (doc, shingle) rows
    * enters the shuffled exact equi-join that removes false positives.
    * No false negatives (Bloom guarantee) + exact verify ⇒ output is
    * IDENTICAL to [[overlaps]] — which is why q_decontaminate_bloom
    * hash-matches the same DuckDB oracle, and the spec pins equality.
    *
    * Built on Spark's own sketch expressions (BloomFilterAggregate /
    * BloomFilterMightContain — the machinery behind runtime join
    * filters), composed via the graftbridge: the filter aggregates
    * distributed over the benchmark, one bounded binary collects to the
    * driver, and the probe is a codegen'd predicate on xxhash64(shingle).
    */
  def overlapsViaBloom(
      train: DataFrame,
      bench: DataFrame,
      minShared: Int = 5,
      w: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text",
      expectedShingles: Long = 1000000L,
      fpp: Double = 0.01
  ): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.types.BinaryType

    // persisted: BOTH the filter-build action and the exact-verify join
    // scan the exploded bench side; without the cache the benchmark suite
    // is read and re-shingled twice per call (session hygiene unpersists —
    // Bench per query, Verify at end of run — the Components precedent)
    val b = bench.select(col(idCol).as("bench_id"),
      explode(Dedup.shingles(col(textCol), w)).as("sh"))
      .persist()
    // bits per the standard BF sizing: m = -n ln(p) / (ln 2)^2
    val numBits = math.max(64L,
      (-expectedShingles * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    // BloomFilterAggregate silently clamps to the runtime-filter conf caps
    // (Math.min against maxNumItems/maxNumBits) — a clamped filter keeps
    // working but its fpp degrades toward 1 and the prefilter stops
    // filtering, defeating the method at exactly the scale it exists for.
    // Fail loudly instead; GraftSession.tune raises the caps well past the
    // runtime-filter defaults.
    val conf = bench.sparkSession.conf
    val maxItems = conf.getOption("spark.sql.optimizer.runtime.bloomFilter.maxNumItems")
      .map(_.toLong).getOrElse(4000000L)
    val maxBits = conf.getOption("spark.sql.optimizer.runtime.bloomFilter.maxNumBits")
      .map(_.toLong).getOrElse(67108864L)
    require(expectedShingles <= maxItems && numBits <= maxBits,
      s"requested Bloom filter ($expectedShingles items / $numBits bits) exceeds " +
        s"spark.sql.optimizer.runtime.bloomFilter.maxNumItems/maxNumBits " +
        s"($maxItems / $maxBits) and would be silently clamped — raise the confs")
    val bfAgg = ColumnBridge.column(
      BloomFilterAggregate(
        ColumnBridge.expression(xxhash64(col("sh"))),
        Literal(expectedShingles), Literal(numBits), 0, 0).toAggregateExpression())
    val bf = b.select(bfAgg.as("bf")).head().getAs[Array[Byte]](0)

    val mightContain = ColumnBridge.column(
      BloomFilterMightContain(
        Literal(bf, BinaryType),
        ColumnBridge.expression(xxhash64(col("sh")))))
    val t = train.select(col(idCol).as("doc_id"),
      explode(Dedup.shingles(col(textCol), w)).as("sh"))
      .filter(mightContain)
    // exact verify on the prefiltered survivors — a shuffled equi-join on
    // the shingle key (NOT broadcast: this path exists precisely because
    // the bench side is assumed too big for that)
    t.join(b.hint("shuffle_hash"), Seq("sh"))
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Graded contamination: per training document, the FRACTION of its
    * distinct shingles that appear anywhere in the benchmark suite —
    * 0.0 = clean, 1.0 = fully contained. The boolean ≥ `minShared` gate
    * ([[overlaps]]) is the drop policy; the fraction is what you threshold
    * per-benchmark, report in a curation audit, or regress leakage
    * against. Same scale shape: the benchmark's distinct-shingle SET
    * broadcasts (smaller still than the (bench_id, shingle) pairs), the
    * corpus streams through a map-side semi-join, one doc-key aggregate.
    */
  def overlapFraction(
      train: DataFrame,
      bench: DataFrame,
      w: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val t = train.select(col(idCol).as("doc_id"),
      explode(Dedup.shingles(col(textCol), w)).as("sh"))
    val bsh = bench.select(explode(Dedup.shingles(col(textCol), w)).as("sh")).distinct()
    val tot = t.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
    val hit = t.join(broadcast(bsh), Seq("sh"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit"))
    tot.join(hit, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        round(coalesce(col("n_hit"), lit(0L)).cast("double") / col("n_shingles"), 6)
          .as("contamination_frac"))
  }

  /** Corpus diagnostic: the SOURCE-pair overlap matrix — for every pair of
    * sources, how many distinct shingles they share. This is how you find
    * out which feeds are mirroring each other (and will defeat per-source
    * quotas) before training. Never a source × source join: distinct
    * (source, shingle) rows aggregate per shingle to a source SET (bounded
    * by the source vocabulary, not data volume), and pairs explode within
    * each set — one shuffle on the shingle, pair fan-out ≤ |sources|² per
    * shingle.
    */
  def sourceOverlap(
      docs: DataFrame,
      sourceCol: String = "source",
      textCol: String = "text",
      w: Int = 3
  ): DataFrame = {
    val sh = docs
      .select(col(sourceCol).as("_src"), explode(Dedup.shingles(col(textCol), w)).as("sh"))
      .distinct()
    sh.groupBy(col("sh")).agg(collect_set(col("_src")).as("_srcs"))
      .select(explode(col("_srcs")).as("source_a"), col("_srcs"))
      .select(col("source_a"), explode(col("_srcs")).as("source_b"))
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** The decontaminated corpus: training rows with NO benchmark overlap at
    * the threshold.
    */
  def clean(
      train: DataFrame,
      bench: DataFrame,
      minShared: Int = 5,
      w: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame =
    train.join(
      overlaps(train, bench, minShared, w, idCol, textCol)
        .select(col("doc_id").as(idCol)).distinct(),
      Seq(idCol),
      "left_anti")
}
