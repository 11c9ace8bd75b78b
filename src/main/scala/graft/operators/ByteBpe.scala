package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-level BPE (Radford et al. 2019, GPT-2): BPE over UTF-8 BYTES
  * instead of characters, with the reversible 256-entry byte↔unicode
  * table, so EVERY string is tokenizable with zero OOV — the base
  * alphabet is all 256 single-byte symbols, and merges only ever
  * concatenate them.
  *
  * The byte→unicode map exists because raw bytes include whitespace and
  * control codes that break text-side tooling: GPT-2 remaps every
  * non-printable byte to a printable code point ≥ U+0100 (`Ġ` for space
  * is the famous one) and keeps printable latin bytes as themselves. The
  * table is a pure driver-side constant — 256 rows shipped as literals
  * into BOTH the Spark plan (a map literal in one zero-shuffle
  * projection) and the generated DuckDB oracle (a VALUES table keyed by
  * the hex byte pair), the q_cosine_neardup constant-shipping recipe.
  *
  * Training is [[Bpe.trainMergesFrom]] over the byte-symbolized
  * word-frequency table: same corpus-scale economics (one shuffle builds
  * (word, n); every merge round touches |V| rows), same deterministic
  * (count DESC, left, right) argmax, same native merge kernel. No `</w>`
  * marker — GPT-2 byte BPE has none (word boundaries live in the
  * pre-tokenizer, not the symbol stream).
  *
  * Reference scope: the reference pipeline has no subword tokenizer at
  * all (its TF-IDF features are word-level, src/spark/preprocessing.py);
  * this completes the SURVEY §2.12 tokenizer block's fourth mainstream
  * family next to char-BPE / UnigramLM / WordPiece.
  */
object ByteBpe {

  /** GPT-2's bytes_to_unicode: printable latin bytes (0x21–0x7E,
    * 0xA1–0xAC, 0xAE–0xFF) map to their own code point; the other 68
    * bytes map to 0x100 + k in ascending byte order. Bijective by
    * construction (the shifted range can't collide with the kept one).
    */
  lazy val byteToChar: IndexedSeq[String] = {
    val keep = ((0x21 to 0x7e) ++ (0xa1 to 0xac) ++ (0xae to 0xff)).toSet
    var n = 0
    (0 until 256).map { b =>
      if (keep(b)) b.toChar.toString
      else { val s = (256 + n).toChar.toString; n += 1; s }
    }
  }

  /** Inverse table for the decode path (and the round-trip spec). */
  lazy val charToByte: Map[String, Int] =
    byteToChar.zipWithIndex.map { case (c, b) => c -> b }.toMap

  /** Driver-side decode of a merged piece sequence back to the original
    * bytes — the zero-OOV reversibility contract (spec-pinned): every
    * piece is a concatenation of mapped single-byte chars, so char-wise
    * inverse lookup reconstructs the exact byte string.
    */
  def decodePieces(pieces: Seq[String]): Array[Byte] =
    pieces.flatMap(_.map(c => charToByte(c.toString).toByte)).toArray

  /** (word, n) → (word, n, syms): the word's UTF-8 bytes mapped through
    * the byte→unicode table. Spelled over the hex dump (`hex(encode(w))`
    * — two chars per byte) so the DuckDB oracle can replay it with the
    * identical VALUES lookup; one zero-shuffle projection, no UDF.
    */
  def symbolizeBytes(wordCounts: DataFrame): DataFrame = {
    val table = typedLit((0 until 256).map(b => f"$b%02X" -> byteToChar(b)).toMap)
    val h = hex(encode(col("word"), "UTF-8"))
    wordCounts.withColumn("syms",
      transform(sequence(lit(1), (length(h) / lit(2)).cast("int")),
        i => element_at(table, h.substr(i * lit(2) - lit(1), lit(2)))))
  }

  /** The learned merge table (merge_idx, left, right, cnt) over the
    * byte-symbolized vocab — [[Bpe.mergeTable]]'s byte-level twin.
    */
  def mergeTable(spark: SparkSession, wordCounts: DataFrame, nMerges: Int): DataFrame = {
    import spark.implicits._
    trainMerges(wordCounts, nMerges)
      .map(m => (m.idx, m.left, m.right, m.cnt))
      .toDF("merge_idx", "left", "right", "cnt")
  }

  def trainMerges(wordCounts: DataFrame, nMerges: Int): Seq[Bpe.Merge] =
    Bpe.trainMergesFrom(symbolizeBytes(wordCounts), nMerges)

  /** ENCODE path under a learned merge list (merges as literals, rank
    * order, one zero-shuffle projection through the native kernel).
    */
  def encodeWords(wordCounts: DataFrame, merges: Seq[Bpe.Merge]): DataFrame =
    symbolizeBytes(wordCounts).withColumn("syms",
      graft.expressions.BpeMerge.applyMerges(
        col("syms"), merges.sortBy(_.idx).map(m => (m.left, m.right))))

  /** The corpus subword vocabulary those merges induce (subword,
    * n_tokens) — symbols are mapped-byte strings, e.g. `the` only after
    * two merges built it.
    */
  def subwordVocab(wordCounts: DataFrame, merges: Seq[Bpe.Merge]): DataFrame =
    encodeWords(wordCounts, merges)
      .select(explode(col("syms")).as("subword"), col("n"))
      .groupBy(col("subword"))
      .agg(sum(col("n")).as("n_tokens"))

  /** Fertility under the learned merges — the [[Bpe.fertility]] twin with
    * byte-denominated pieces (n_chars stays RAW characters so the
    * families' chars_per_piece columns compare like for like; a multibyte
    * char contributes >1 base symbol but 1 char).
    */
  def fertility(wordCounts: DataFrame, merges: Seq[Bpe.Merge]): DataFrame =
    encodeWords(wordCounts, merges)
      .select(col("n"), length(col("word")).cast("long").as("m"),
        size(col("syms")).cast("long").as("np"))
      .agg(sum(col("n")).as("n_words"),
        sum(col("n") * col("np")).as("n_pieces"),
        sum(col("n") * col("m")).as("n_chars"))
      .select(col("n_words"), col("n_pieces"), col("n_chars"),
        expr("n_pieces * 1000000 DIV n_words").as("fertility_micros"),
        expr("n_chars * 1000000 DIV n_pieces").as("chars_per_piece_micros"))
}
