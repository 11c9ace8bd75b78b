package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Interpolated Kneser–Ney bigram scoring — the smoothing KenLM actually
  * ships (Heafield 2011; Kneser & Ney 1995), next to [[LmScore]]'s add-k
  * stand-in: instead of adding phantom counts, absolute discounting moves
  * a fixed mass D off every seen bigram and redistributes it by
  * CONTINUATION probability (how many distinct contexts a word follows,
  * not how often it occurs — "San Francisco" makes "Francisco" frequent
  * but a terrible unigram fallback, the canonical KN motivation):
  *
  *   P(w2|w1) = max(c(w1w2) − D, 0) / c(w1)
  *            + D · N1+(w1·) / c(w1) · N1+(·w2) / N1+(··)
  *
  * with D = 3/4 (the textbook constant), c(w1) = bigram positions headed
  * by w1, N1+(w1·) / N1+(·w2) the distinct continuation / context type
  * counts, and N1+(··) the total distinct bigram types T.
  *
  * Exactness: D = 3/4 makes every probability the RATIO OF TWO EXACT
  * BIGINTS — num = max(4·c₁₂ − 3, 0)·T + 3·N1+(w1·)·max(N1+(·w2), 1),
  * den = 4·c(w1)·T for a seen context, and num = max(N1+(·w2), 1),
  * den = T for an unseen one (the max(…, 1) floors give unknown words one
  * phantom continuation type so the log is always defined). The only
  * floats are ONE division of the two exact integers and its ln, floor-6
  * quantized PER POSITION before the integer per-document sum — the
  * Markov-entropy discipline, so the whole score hash-replays. Products
  * stay under 2⁵³ while c·T ≲ 10¹⁵; at 100-TB corpus scale prune the LM
  * (minCount, as [[LmScore.score]]) before the counts approach that.
  *
  * Scale shape: three aggregations over the train corpus build the LM
  * (bigram types, per-head sums, per-tail type counts — each one shuffle
  * of the bigram table, the second two over the ALREADY-AGGREGATED type
  * table); scoring explodes the scored docs to positions and equi-joins
  * the LM tables back (broadcastable once pruned). No driver state.
  *
  * Reference scope: the reference has no LM scoring; SURVEY §2.12
  * text-quality extension (family of [[LmScore]], [[Dsir]],
  * [[QualityBuckets]]).
  */
object KneserNey {

  /** (doc_id, n_bigrams, sum_logp_e6, avg_logp_e6) for every scored doc
    * with ≥1 bigram, under an interpolated-KN bigram LM counted from
    * `lm`. Pass disjoint frames to exercise the backoff (held-out docs
    * carry unseen bigrams, contexts, and words); self-scoring degenerates
    * to the seen-context branch everywhere.
    */
  def score(
      docs: DataFrame,
      lm: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val toksOf = (df: DataFrame) =>
      df.select(col(idCol), TextFunctions.tokens(col(textCol)).as("toks"))
    val bi = toksOf(lm)
      .select(explode(LmScore.bigramPositions(col("toks"))).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("cb"))
    // per-head totals/type-counts reduce the TYPE table, not the corpus
    val heads = bi
      .groupBy(substring_index(col("b"), " ", 1).as("w1"))
      .agg(sum(col("cb")).as("cw"), count(lit(1)).as("nh"))
    val tails = bi
      .groupBy(substring_index(col("b"), " ", -1).as("w2"))
      .agg(count(lit(1)).as("nt"))
    val types = bi.agg(count(lit(1)).as("t"))

    val seen = col("cw").isNotNull
    val num = when(seen,
        greatest(lit(4L) * coalesce(col("cb"), lit(0L)) - lit(3L), lit(0L)) * col("t")
          + lit(3L) * col("nh") * greatest(coalesce(col("nt"), lit(0L)), lit(1L)))
      .otherwise(greatest(coalesce(col("nt"), lit(0L)), lit(1L)))
    val den = when(seen, lit(4L) * col("cw") * col("t")).otherwise(col("t"))
    val ln6 = floor(log(num.cast("double") / den.cast("double")) * lit(1000000.0)
      + lit(0.5)).cast("long")

    toksOf(docs)
      .select(col(idCol), explode(LmScore.bigramPositions(col("toks"))).as("b"))
      .join(bi, Seq("b"), "left")
      .withColumn("w1", substring_index(col("b"), " ", 1))
      .withColumn("w2", substring_index(col("b"), " ", -1))
      .join(heads, Seq("w1"), "left")
      .join(tails, Seq("w2"), "left")
      .crossJoin(broadcast(types))
      .select(col(idCol), ln6.as("_l"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(col("_l")).as("sum_logp_e6"),
        floor(sum(col("_l")).cast("double") / count(lit(1))).cast("long")
          .as("avg_logp_e6"))
  }
}
