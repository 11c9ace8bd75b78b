package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Bigram language-model quality scoring — the KenLM-style perplexity
  * filter of LLM data curation: score every document by the average
  * add-k-smoothed bigram log-probability under an LM counted from a
  * reference corpus, and drop the tail (gibberish, boilerplate, wrong
  * language all score low).
  *
  * Scale shape: two count aggregations build the LM (one shuffle each);
  * scoring explodes documents to bigram positions and joins the LM tables
  * back. At corpus scale the LM tables are pruned with `minCount` (hapax
  * n-grams are noise anyway), which keeps them broadcastable — the scoring
  * join then never shuffles the corpus. Probabilities:
  * P(w2|w1) = (c(w1 w2) + k) / (c(w1) + k·V), V = |vocab|.
  */
object LmScore {

  /** Bigram position strings ("w1 w2", duplicates kept — these are
    * positions, not types) from a token array. One construction shared with
    * the repetition filters so the two can't drift.
    */
  def bigramPositions(toks: Column): Column = Repetition.bigrams(toks)

  /** (doc_id, n_bigrams, avg_logp) for every document with ≥1 bigram,
    * scored against an LM counted from `lm` (pass the same frame to
    * self-score a corpus, or a clean reference corpus to filter against).
    * `minCount` prunes LM entries below the threshold (0-count smoothing
    * then applies to pruned positions via the left joins).
    */
  def score(
      docs: DataFrame,
      lm: DataFrame,
      k: Double = 1.0,
      minCount: Long = 1L,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val toksOf = (df: DataFrame) =>
      df.select(col(idCol), TextFunctions.tokens(col(textCol)).as("toks"))
    val lmToks = toksOf(lm)
    val unis = lmToks.select(explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cu"))
      .filter(col("cu") >= minCount)
    val bis = lmToks.select(explode(bigramPositions(col("toks"))).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("cb"))
      .filter(col("cb") >= minCount)
    // V from the unpruned vocab: smoothing mass shouldn't depend on pruning
    val vocab = lmToks.select(explode(col("toks")).as("w"))
      .agg(countDistinct(col("w")).as("v"))

    // with minCount pruning the LM tables are bounded (hapax mass removed)
    // — broadcast them so the exploded corpus never shuffles; unpruned LMs
    // can exceed executor memory, so leave those to AQE's own choice
    val maybeBroadcast = (df: DataFrame) => if (minCount > 1L) broadcast(df) else df
    toksOf(docs)
      .select(col(idCol), explode(bigramPositions(col("toks"))).as("b"))
      .join(maybeBroadcast(bis), Seq("b"), "left")
      .withColumn("w1", substring_index(col("b"), " ", 1))
      .join(maybeBroadcast(unis.withColumnRenamed("w", "w1")), Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col(idCol),
        log((coalesce(col("cb"), lit(0L)) + lit(k)) /
          (coalesce(col("cu"), lit(0L)) + lit(k) * col("v"))).as("logp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), round(avg(col("logp")), 6).as("avg_logp"))
  }

  /** Stateless per-row twin of [[score]]: the minCount-pruned LM tables are
    * collected once and shipped into the plan as map literals, so scoring
    * is a single zero-shuffle projection — no explode, no join, no
    * aggregation. That is the spelling a LIVE FEED needs: it runs unchanged
    * on a streaming frame in append mode with no watermark and no state
    * store (the batch `score` ends in a streaming aggregation there), and
    * the LM rides along as a broadcast model artifact the way a trained
    * filter model would.
    *
    * The driver collect is bounded by construction — `minCount` must prune
    * (require > 1), which caps the tables at the non-hapax mass. One honest
    * caveat: Spark evaluates map-literal lookups by linear scan, so keep
    * the pruned LM in the low thousands of entries; past that, the
    * broadcast-JOIN spelling in [[score]] is the scale path.
    *
    * Math and output are identical to [[score]] (same bigram positions,
    * same add-k smoothing, docs with zero bigrams dropped); per-document
    * averaging folds the positions in array order, which is the same order
    * the exploded rows reach `avg`, so the parity is exact, not approximate
    * (pinned by LmScoreSpec and the streaming batch-parity spec).
    */
  def scoreStateless(
      docs: DataFrame,
      lm: DataFrame,
      k: Double = 1.0,
      minCount: Long = 2L,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    require(minCount > 1L,
      "stateless scoring collects the LM to the driver; minCount must prune (> 1) to bound it")
    val lmToks = lm.select(TextFunctions.tokens(col(textCol)).as("toks"))
    // one tokenize+shuffle pass serves both V (unpruned vocab size, exactly
    // like score()) and the pruned cu table: aggregate once, persist the
    // small per-word frame, count + filtered-collect from the cache
    val unisAll = lmToks.select(explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cu")).persist()
    val v = unisAll.count()
    val cu = unisAll.filter(col("cu") >= minCount)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    unisAll.unpersist(blocking = false)
    val cb = lmToks.select(explode(bigramPositions(col("toks"))).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("cb"))
      .filter(col("cb") >= minCount)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // Catalyst probes map literals by LINEAR scan, so a flat bigram map
    // costs O(|cb|) per position. Nest it by first word instead: the outer
    // map has at most |pruned vocab| keys (c(w1) >= c(w1 w2) >= minCount,
    // so every bigram head survives the unigram pruning), and each inner
    // map holds only that head's continuations — two short scans instead
    // of one long one (~10x fewer key compares at our LM shape).
    val cbNested: Map[String, Map[String, Long]] = cb
      .groupBy { case (b, _) => b.substring(0, b.indexOf(' ')) }
      .map { case (w1, m) =>
        w1 -> m.map { case (b, c) => b.substring(b.indexOf(' ') + 1) -> c }
      }

    val cuMap = typedlit(cu)
    val cbMap = typedlit(cbNested)
    // ANSI mode: element_at throws on a missing map key — try_element_at
    // is the null-on-miss spelling the 0-count smoothing needs (and it
    // null-propagates through the missing-outer-key case of the nested map)
    val logpOf = (b: Column) => {
      val w1 = substring_index(b, " ", 1)
      log((coalesce(
        try_element_at(try_element_at(cbMap, w1), substring_index(b, " ", -1)),
        lit(0L)) + lit(k)) /
        (coalesce(try_element_at(cuMap, w1), lit(0L)) + lit(k) * lit(v.toDouble)))
    }
    docs
      .select(col(idCol), bigramPositions(TextFunctions.tokens(col(textCol))).as("_bs"))
      .filter(size(col("_bs")) >= 1)
      .select(col(idCol),
        size(col("_bs")).cast("long").as("n_bigrams"),
        round(
          aggregate(col("_bs"), lit(0.0), (acc, b) => acc + logpOf(b)) /
            size(col("_bs")),
          6).as("avg_logp"))
  }
}
