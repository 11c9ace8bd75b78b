package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Repetition-based quality filters for training-data curation — the
  * Gopher/C4-family signals (duplicate word / bigram / line fractions, most
  * frequent word share) used to drop boilerplate and degenerate documents
  * before LLM training.
  *
  * Every metric is a per-document expression over the tokenized text: the
  * whole operator is a single codegen'd projection — zero shuffle, zero
  * state — so it streams through a 100 TB corpus at scan speed. The one
  * non-obvious spelling is `topWordFrac`: counting the most frequent token
  * via `array_sort` + one `aggregate` pass (longest equal-run) is O(n log n)
  * per doc instead of the O(n²) distinct×filter spelling.
  */
object Repetition {

  /** Lowercased whitespace tokens, empty strings dropped. */
  def words(text: Column): Column =
    filter(split(lower(text), "\\s+"), w => w =!= "")

  /** Fraction of tokens that are repeats of an earlier token:
    * 1 − |distinct| / |all| (0 for empty docs).
    */
  def dupFrac(tokens: Column): Column = {
    val n = size(tokens)
    when(n === 0, lit(0.0))
      .otherwise(lit(1.0) - size(array_distinct(tokens)).cast("double") / n.cast("double"))
  }

  /** Adjacent-pair (word 2-gram) array: ["a b", "b c", ...]. */
  def bigrams(tokens: Column): Column = {
    val n = size(tokens)
    zip_with(slice(tokens, lit(1), greatest(n - 1, lit(0))),
      slice(tokens, lit(2), greatest(n - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
  }

  /** Non-blank lines of the raw text (trailing/leading spaces kept — a line
    * repeated verbatim is the boilerplate signal).
    */
  def lines(text: Column): Column =
    filter(split(text, "\n"), l => l =!= "")

  /** Share of the document taken by its single most frequent token:
    * longest equal-run of the sorted token array / token count.
    * One `aggregate` pass; state is (prev, run, best).
    */
  def topWordFrac(tokens: Column): Column = {
    val n = size(tokens)
    val best = aggregate(
      array_sort(tokens),
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1).otherwise(lit(1))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best")
    )
    when(n === 0, lit(0.0)).otherwise(best.cast("double") / n.cast("double"))
  }

  /** All repetition metrics for a text column, rounded for cross-engine
    * comparison (the ratios are exact rationals in double, but round(6)
    * keeps the contract uniform with the other text metrics).
    */
  def scores(df: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = words(col(textCol))
    df.select(
      df.columns.filterNot(_ == textCol).map(col) :+
        size(toks).as("n_words") :+
        round(dupFrac(toks), 6).as("dup_word_frac") :+
        round(dupFrac(bigrams(toks)), 6).as("dup_bigram_frac") :+
        round(dupFrac(lines(col(textCol))), 6).as("dup_line_frac") :+
        round(topWordFrac(toks), 6).as("top_word_frac"): _*
    )
  }
}
