package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WordPiece tokenizer (Devlin et al. 2018, BERT) — the third classic
  * subword family next to [[Bpe]] (merge-based) and [[UnigramLm]]
  * (likelihood-based): a fixed piece vocabulary, words encoded by GREEDY
  * longest-match-first with `##`-prefixed continuation pieces, and
  * `[UNK]` when a position cannot be covered.
  *
  * The reference pipeline's tokenizer is word-level (reference:
  * src/spark/preprocessing.py tokenize path); this completes SURVEY
  * §2.12's tokenizer block down to the BERT-style subword scheme.
  *
  * Vocabulary construction is fully relational and deterministic (no RNG,
  * no iterative trainer): candidate pieces are every word-initial
  * substring (verbatim) and every continuation substring (`##`-prefixed)
  * up to [[MaxPiece]] chars, weighted by word frequency; the vocab keeps
  * ALL single-char pieces in both forms (BERT's alphabet-coverage
  * guarantee — every training word is then segmentable, so `[UNK]` is
  * reserved for out-of-population input) plus the `topV` multi-char
  * pieces under (weighted count DESC, piece ASC). That is the
  * frequency-substring scheme rather than BPE-likelihood growing — chosen
  * because it is one aggregation + one bounded top-V sort, exactly
  * replayable by the DuckDB oracle.
  *
  * Determinism contract (the [[UnigramLm]] discipline): training words
  * are printable ASCII ≤ [[MaxWordLen]] chars EXCLUDING `#` (a literal
  * `#` in a word would make the word-initial form of `##x` collide with
  * the continuation marker — the classic WordPiece ambiguity, which BERT
  * sidesteps in its basic tokenizer; the population predicate
  * [[isWordPieceWord]] is the single shared spelling).
  *
  * Scale shape: the vocab build touches only the AGGREGATED word table
  * (Heaps-law sublinear in corpus size) and its candidate explosion is
  * bounded by maxLen·maxPiece per word; the piece set is a bounded driver
  * object shipped as an expression literal, so the encode is ONE
  * zero-shuffle codegen'd projection ([[graft.expressions.WordPieceSegment]])
  * — at 100 TB nothing after the initial word count touches the corpus.
  */
object WordPiece {

  val MaxWordLen = 12
  val MaxPiece = 4
  val TopV = 500

  /** The training-word population: printable ASCII ≤ MaxWordLen, no `#`
    * (\x23) — one spelling shared by vocab build, encode, fertility, and
    * the DuckDB oracles so the population cannot drift.
    */
  def isWordPieceWord(w: Column): Column =
    w.rlike("^[\\x21-\\x22\\x24-\\x7e]{1," + MaxWordLen + "}$")

  private def trainingWords(wordCounts: DataFrame): DataFrame =
    wordCounts
      .filter(isWordPieceWord(col("word")))
      .select(col("word"), col("n"), length(col("word")).as("m"))

  /** Every candidate piece of every training word, one row per occurrence
    * position: word-initial substrings verbatim, continuation substrings
    * `##`-prefixed, underlying length 1..[[MaxPiece]].
    */
  private def pieceCandidates(words: DataFrame): DataFrame =
    words.select(col("n"),
      explode(flatten(transform(sequence(lit(1), col("m")), i =>
        transform(sequence(lit(1), least(lit(MaxPiece), col("m") - i + lit(1))), L =>
          when(i === lit(1), col("word").substr(i, L))
            .otherwise(concat(lit("##"), col("word").substr(i, L))))))).as("piece"))

  /** The piece vocabulary `(piece, c)`: all single-char forms + top-V
    * multi-char by (weighted occurrence count DESC, piece ASC).
    */
  def vocab(wordCounts: DataFrame, topV: Int = TopV): DataFrame = {
    val agg = pieceCandidates(trainingWords(wordCounts))
      .groupBy(col("piece")).agg(sum(col("n")).as("c"))
    // underlying length: strip the ## marker (unambiguous — training
    // words cannot contain '#', so a ##-prefixed piece is always a
    // continuation form)
    val uL = length(col("piece")) -
      when(col("piece").startsWith("##"), lit(2)).otherwise(lit(0))
    agg.filter(uL === 1)
      .unionByName(agg.filter(uL > 1).orderBy(col("c").desc, col("piece")).limit(topV))
  }

  /** The vocab as an in-memory piece set — a bounded driver object
    * (≤ topV + 2·|alphabet| entries), the BPE-merges / k-means-centers
    * broadcast-as-literal pattern.
    */
  def vocabSet(wordCounts: DataFrame, topV: Int = TopV): Set[String] =
    vocab(wordCounts, topV).collect().map(_.getString(0)).toSet

  /** ENCODE path: greedy longest-match segmentation of the word table
    * under a piece set — adds `pieces` in one zero-shuffle projection.
    */
  def encodeWords(wordCounts: DataFrame, pieces: Set[String]): DataFrame =
    trainingWords(wordCounts).withColumn("pieces",
      graft.expressions.WordPieceSegment.segment(col("word"), pieces, MaxPiece))

  /** Corpus subword vocabulary induced by the greedy encode (the
    * [[Bpe.subwordVocab]] / [[UnigramLm.subwordVocab]] twin):
    * `(subword, n_tokens)` weighted by word frequency.
    */
  def subwordVocab(wordCounts: DataFrame, topV: Int = TopV): DataFrame =
    encodeWords(wordCounts, vocabSet(wordCounts, topV))
      .select(explode(col("pieces")).as("subword"), col("n"))
      .groupBy(col("subword")).agg(sum(col("n")).as("n_tokens"))

  /** Lossless round-trip CONTRACT (1 row): stripping `##` and
    * concatenating each word's pieces must reproduce the word — greedy
    * covers create a partition of the word by construction, and the
    * alphabet guarantee means no training word hits `[UNK]`.
    */
  def roundtripReport(wordCounts: DataFrame, topV: Int = TopV): DataFrame =
    encodeWords(wordCounts, vocabSet(wordCounts, topV))
      .select((concat_ws("", transform(col("pieces"), p =>
        when(p.startsWith("##"), p.substr(lit(3), length(p))).otherwise(p)))
        === col("word")).as("ok"))
      .agg(count(lit(1)).as("n_words"),
        sum(when(col("ok"), 1L).otherwise(0L)).as("n_roundtrip"))

  /** Tokenizer fertility report (1 row) — same columns and integer
    * discipline as [[Bpe.fertility]] / [[UnigramLm.fertility]], so the
    * three tokenizer families compare on one scale.
    */
  def fertility(wordCounts: DataFrame, topV: Int = TopV): DataFrame =
    encodeWords(wordCounts, vocabSet(wordCounts, topV))
      .select(col("n"), col("m").cast("long").as("mc"),
        size(col("pieces")).cast("long").as("np"))
      .agg(sum(col("n")).as("n_words"),
        sum(col("n") * col("np")).as("n_pieces"),
        sum(col("n") * col("mc")).as("n_chars"))
      .select(col("n_words"), col("n_pieces"), col("n_chars"),
        expr("n_pieces * 1000000 DIV n_words").as("fertility_micros"),
        expr("n_chars * 1000000 DIV n_pieces").as("chars_per_piece_micros"))
}
