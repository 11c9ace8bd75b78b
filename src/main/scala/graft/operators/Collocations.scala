package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Collocation mining — pointwise mutual information of adjacent token
  * bigrams against corpus unigram frequencies:
  *
  *   PMI(a,b) = ln( c(ab)·N_bi / (c(a)·c(b)) )
  *
  * with c(ab) the corpus bigram count, N_bi the total bigram count and
  * c(·) raw corpus unigram counts (the marginal convention is part of the
  * contract). High-PMI pairs are the multi-word expressions an LLM data
  * pipeline protects from tokenizer splits / shuffling.
  *
  * Determinism: all counts are exact integers; PMI is one replayed double
  * expression (ln is cross-engine stable — the TfIdf/BM25/LM-score
  * precedent), floor-6 output; the `minCount` support filter is integer.
  *
  * Scale: bigram and unigram counting are map-side-combinable aggregates
  * off one tokenize pass; the final three-way join runs on the (already
  * aggregated) vocabulary, not the corpus.
  */
object Collocations {

  /** (w1, w2, n_pair, pmi) — all bigrams with corpus count ≥ minCount. */
  def pmiBigrams(docs: DataFrame, minCount: Long = 5L): DataFrame = {
    val toks = docs.select(col("doc_id"), TF.tokens(col("text")).as("t"))
    val bi = toks
      .where(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(t) - 1), i -> struct(t[i-1] AS w1, t[i] AS w2))")).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val bc = bi.groupBy("w1", "w2").agg(count(lit(1)).as("n_pair"))
      .where(col("n_pair") >= minCount)
    val uni = toks
      .select(explode(col("t")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cu"))
    val nBi = toks
      .where(size(col("t")) >= 2)
      .agg(sum(size(col("t")) - lit(1)).cast("long").as("n_bi"))
    bc.join(uni.withColumnRenamed("w", "w1").withColumnRenamed("cu", "c1"), "w1")
      .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("cu", "c2"), "w2")
      .crossJoin(broadcast(nBi))
      .select(
        col("w1"), col("w2"), col("n_pair"),
        (floor(
          log(col("n_pair").cast("double") * col("n_bi").cast("double")
            / (col("c1").cast("double") * col("c2").cast("double")))
            * lit(1000000.0d) + lit(0.5d)) / lit(1000000.0d)).as("pmi"))
  }
}
