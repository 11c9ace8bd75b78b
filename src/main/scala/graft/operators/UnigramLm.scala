package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SentencePiece-style unigram LM tokenizer trainer (Kudo 2018) —
  * replayable Viterbi EM over the word-frequency table, completing the
  * tokenizer pair next to [[Bpe]] (the two public tokenizer families).
  * Reference behavior: the tokenizer-training step of the reference's
  * text pipeline (reference: src/preprocessing/preprocessing.py tokenize
  * path) — generalized to subword pieces.
  *
  * Determinism contract (the [[GmmReplay]]/[[KMeansReplay]] discipline):
  *   - training words are the corpus word counts restricted to printable
  *     ASCII ≤ [[MaxWordLen]] chars, so character indexing agrees
  *     cross-engine by construction;
  *   - the seed vocabulary is every single character plus the `topV`
  *     multi-char substrings (length 2..[[MaxPiece]]) under
  *     (weighted-occurrence count DESC, piece ASC);
  *   - piece scores are integer micros `e6(ln c) − e6(ln Σc)` — each ln
  *     quantized BEFORE any combination (the Zipf/NMI ln-replay rule);
  *   - the E-step is hard (Viterbi) EM: each word's best segmentation
  *     under the exact BIGINT path sums, tie-broken on the smallest piece
  *     start at every position ([[graft.expressions.UnigramSegment]]);
  *   - the M-step is exact BIGINT piece counts; characters never die
  *     (count floored at 1 — SentencePiece's coverage guarantee), unused
  *     multi-char pieces drop;
  *   - after `rounds` E/M rounds, multi-char pieces below `minCount`
  *     prune away and scores recompute over the pruned total.
  *
  * Scale shape: the piece table is ≤ topV + |alphabet| rows — a bounded
  * driver object shipped as an expression literal (the BPE-merges /
  * k-means-centers pattern) — so each E-step is ONE zero-shuffle codegen'd
  * projection over the AGGREGATED word table (vocab-sized, never
  * corpus-sized), and each M-step one hash aggregation of its exploded
  * pieces. At 100 TB the word table is the Heaps-law sublinear vocabulary;
  * nothing here touches the corpus after the initial word count.
  */
object UnigramLm {

  val MaxWordLen = 12
  val MaxPiece = 4

  private def e6ln(x: Long): Long = {
    require(x > 0, s"e6ln of non-positive $x")
    math.floor(math.log(x.toDouble) * 1e6 + 0.5).toLong
  }

  /** All substrings of length 1..maxPiece as one array column. */
  private def allSubstrings(w: Column, maxPiece: Int): Column =
    flatten(transform(sequence(lit(1), length(w)),
      i => transform(sequence(lit(1), least(lit(maxPiece), i)),
        L => w.substr(i - L + lit(1), L))))

  /** integer-micros scores over a count table: e6(ln c) − e6(ln Σc). */
  private def scored(counts: Seq[(String, Long)]): Map[String, Long] = {
    val lt = e6ln(counts.map(_._2).sum)
    counts.map { case (p, c) => p -> (e6ln(c) - lt) }.toMap
  }

  /** Trained piece table `(piece, cnt, logp_micro)` from a `(word, n)`
    * frequency frame.
    */
  /** The ASCII ≤ MaxWordLen training restriction as a column predicate —
    * one spelling shared by train / encode / fertility AND the live token
    * meter ([[graft.streaming.StreamTokenize]]) so the word population
    * cannot drift: a word outside it is never trained on and must count
    * as uncovered (0 pieces) wherever the table is applied, even when the
    * Viterbi kernel could technically segment it (a 13+-char ASCII token
    * would otherwise diverge engine vs oracle).
    */
  def isTrainingWord(w: Column): Column =
    w.rlike("^[\\x21-\\x7e]{1," + MaxWordLen + "}$")

  private def trainingWords(wordCounts: DataFrame): DataFrame =
    wordCounts
      .filter(isTrainingWord(col("word")))
      .select(col("word"), col("n"))

  def train(
      spark: SparkSession,
      wordCounts: DataFrame,
      topV: Int = 500,
      rounds: Int = 2,
      minCount: Long = 2L): DataFrame = {
    import spark.implicits._
    require(rounds >= 1 && rounds <= 16, "rounds in 1..16")
    val words = trainingWords(wordCounts).cache()
    try {
      // seed: every char (weighted occurrence count) + top-V multi-char
      // substrings — the multi top-V is a sort over the AGGREGATED
      // substring table (bounded by |vocab|·maxPiece·maxLen), never corpus
      val subs = words
        .select(explode(allSubstrings(col("word"), MaxPiece)).as("piece"), col("n"))
        .groupBy(col("piece")).agg(sum(col("n")).as("c"))
      val seed = subs.filter(length(col("piece")) === 1)
        .unionByName(
          subs.filter(length(col("piece")) > 1)
            .orderBy(col("c").desc, col("piece")).limit(topV))
        .collect()
        .map(r => (r.getString(0), r.getLong(1)))
        .toSeq
      val charSet = seed.collect { case (p, _) if p.length == 1 => p }.toSet

      var counts: Seq[(String, Long)] = seed
      var r = 0
      while (r < rounds) {
        val sc = scored(counts)
        // E-step: one codegen'd projection; M-step: one hash aggregation
        val segCounts = words
          .select(
            explode(graft.expressions.UnigramSegment.segment(col("word"), sc, MaxPiece))
              .as("piece"),
            col("n"))
          .groupBy(col("piece")).agg(sum(col("n")).as("c"))
          .collect()
          .map(row => (row.getString(0), row.getLong(1)))
          .toMap
        // chars floored at 1 (coverage); unused multi pieces drop
        counts = charSet.toSeq.sorted
          .map(ch => (ch, math.max(segCounts.getOrElse(ch, 0L), 1L))) ++
          segCounts.filter { case (p, _) => p.length > 1 }.toSeq.sortBy(_._1)
        r += 1
      }

      val kept = counts.filter { case (p, c) => p.length == 1 || c >= minCount }
      val sc = scored(kept)
      kept.map { case (p, c) => (p, c, sc(p)) }
        .sortBy(_._1)
        .toDF("piece", "cnt", "logp_micro")
    } finally words.unpersist(blocking = false)
  }

  /** ENCODE path: segment a `(word, n)` frame under a trained table —
    * adds `pieces` (the word's subword sequence) in one zero-shuffle
    * projection.
    */
  def encodeWords(wordCounts: DataFrame, table: Map[String, Long]): DataFrame =
    wordCounts.withColumn("pieces",
      graft.expressions.UnigramSegment.segment(col("word"), table, MaxPiece))

  /** Trained table as an in-memory score map (piece → logp_micro). */
  private def trainedTable(
      spark: SparkSession,
      wordCounts: DataFrame,
      topV: Int,
      rounds: Int,
      minCount: Long): Map[String, Long] =
    train(spark, wordCounts, topV, rounds, minCount).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap

  /** Corpus subword vocabulary induced by the trained table (the
    * [[Bpe.subwordVocab]] twin): `(subword, n_tokens)` — train, then ONE
    * zero-shuffle segmentation projection + one hash aggregation.
    */
  def subwordVocab(
      spark: SparkSession,
      wordCounts: DataFrame,
      topV: Int = 500,
      rounds: Int = 2,
      minCount: Long = 2L): DataFrame = {
    val table = trainedTable(spark, wordCounts, topV, rounds, minCount)
    trainingWords(wordCounts)
      .select(
        explode(graft.expressions.UnigramSegment.segment(col("word"), table, MaxPiece))
          .as("subword"),
        col("n"))
      .groupBy(col("subword")).agg(sum(col("n")).as("n_tokens"))
  }

  /** Lossless round-trip CONTRACT (1 row): segmenting every training word
    * under the trained table and concatenating the pieces must reproduce
    * the word — Viterbi paths partition the word by construction, and
    * this query makes that invariant a hashed row (the q_bpe_roundtrip
    * pattern).
    */
  def roundtripReport(
      spark: SparkSession,
      wordCounts: DataFrame,
      topV: Int = 500,
      rounds: Int = 2,
      minCount: Long = 2L): DataFrame = {
    val table = trainedTable(spark, wordCounts, topV, rounds, minCount)
    trainingWords(wordCounts)
      .select((concat_ws("",
        graft.expressions.UnigramSegment.segment(col("word"), table, MaxPiece))
        === col("word")).as("ok"))
      .agg(count(lit(1)).as("n_words"),
        sum(when(col("ok"), 1L).otherwise(0L)).as("n_roundtrip"))
  }

  /** Tokenizer fertility report (1 row): weighted pieces per word
    * occurrence and chars per piece under the trained table — the
    * standard tokenizer-quality diagnostic (lower fertility = fewer
    * pieces per word = cheaper sequences). Exact BIGINT sums, floor
    * divisions.
    */
  def fertility(
      spark: SparkSession,
      wordCounts: DataFrame,
      topV: Int = 500,
      rounds: Int = 2,
      minCount: Long = 2L): DataFrame = {
    val table = trainedTable(spark, wordCounts, topV, rounds, minCount)
    trainingWords(wordCounts)
      .select(col("n"), length(col("word")).cast("long").as("m"),
        size(graft.expressions.UnigramSegment.segment(col("word"), table, MaxPiece))
          .cast("long").as("np"))
      .agg(sum(col("n")).as("n_words"),
        sum(col("n") * col("np")).as("n_pieces"),
        sum(col("n") * col("m")).as("n_chars"))
      .select(col("n_words"), col("n_pieces"), col("n_chars"),
        expr("n_pieces * 1000000 DIV n_words").as("fertility_micros"),
        expr("n_chars * 1000000 DIV n_pieces").as("chars_per_piece_micros"))
  }
}
