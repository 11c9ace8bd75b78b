package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Money, TextFunctions => TF, VectorFunctions => VF}
import graft.ml.{Heuristic, IntentModel, Recommender, Undersample}
import graft.operators.{AbTest, AsOfJoin, Association, Attribution, Autocorrelation, Avi, Changepoint, Churn, Collocations, Components, Concentration, Cuped, Decontaminate, Dedup, Dispersion, Diversity, Dsir, Featurize, GmmReplay, GopherFilter, GroupCap, HashSplit, IntervalOverlap, IvfReplay, KMeansReplay, LmScore, Mixture, Multimodal, Packing, Pareto, Paths, PiiScrub, QuantileNormalize, RankTest, Repetition, RepetitionCoverage, Rfm, SemanticDedup, SessionConf, Sessionize, Similarity, SourceProfile, Streaks, Tempo, Wavelet, WeightedSample}
import graft.oracles.SharedCtes._
import graft.queries.QueryHelpers._
import graft.sources.Tables
import graft.streaming.SessionWindows

/** One domain section of the SparkEntry.queries map — moved
  * verbatim (keys included) in the r18 split; SparkEntry.queries
  * is the ordered concatenation of the domain objects.
  */
private[graft] object QueriesText {
  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- text analysis over documents ----
    "q_token_stats" -> { (s, d) =>
      Tables(s, d).documents.select(
        col("doc_id"),
        TF.tokenCount(col("text")).as("n_tokens"),
        TF.stopwordCount(col("text")).as("stop_hits"),
        length(col("text")).as("text_len")
      )
    },
    "q_quality_scores" -> { (s, d) =>
      Tables(s, d).documents.select(
        col("doc_id"),
        TF.tokenCount(col("text")).as("n_tokens"),
        TF.avgTokenLength(col("text")).as("avg_token_len"),
        TF.stopwordRatio(col("text")).as("stopword_ratio"),
        TF.qualityScore(col("text")).as("quality_score")
      )
    },
    // GPT-style concat-and-split packing index: per-doc start offset /
    // sequence assignment in 512-token windows, packed per language shard
    "q_packing" -> { (s, d) =>
      Packing.packingIndex(Tables(s, d).documents, seqLen = 512)
    },
    // equal-token training shards from a deterministic md5 shuffle order:
    // the global token prefix sum runs as range-repartition + partitioned
    // cumsum + bounded offsets (operators.PrefixSum) — never the
    // single-partition global window the naive spelling plans
    "q_token_shards" -> { (s, d) =>
      val docs = Tables(s, d).documents.select(col("doc_id"),
        TF.tokenCount(col("text")).cast("long").as("n_tokens"),
        HashSplit.md548(col("doc_id")).as("h"))
      graft.operators.PrefixSum
        .budgetShards(docs, Seq("h", "doc_id"), "n_tokens", budget = 20000L)
        .select(col("doc_id"), col("n_tokens"), col("running_total"), col("shard"))
    },
    // character-entropy quality signal (TF.charEntropyFromChars):
    // bits/char of the char distribution — repetitive garbage scores low,
    // base64 noise high; chars bound as a column ONCE (the langId lesson)
    "q_char_entropy" -> { (s, d) =>
      Tables(s, d).documents
        .select(col("doc_id"), TF.chars(col("text")).as("_cs"))
        .select(col("doc_id"),
          size(col("_cs")).cast("long").as("n_chars"),
          round(TF.charEntropyFromChars(col("_cs")), 6).as("char_entropy"))
    },
    // bigram-LM perplexity-style quality score (self-scored corpus LM,
    // add-1 smoothing) — the KenLM-filter shape (operators.LmScore)
    "q_lm_score" -> { (s, d) =>
      val docs = Tables(s, d).documents
      LmScore.score(docs, docs)
    },
    // interpolated Kneser–Ney bigram scoring (operators.KneserNey): the
    // real KenLM smoothing — D=3/4 absolute discount + continuation-type
    // backoff, LM from doc_id%5!=0, holdout scored so unseen bigrams /
    // contexts / words all exercise; exact-BIGINT ratios, floor-6 ln
    "q_kneser_ney" -> { (s, d) =>
      val docs = Tables(s, d).documents
      graft.operators.KneserNey.score(
        docs.filter(col("doc_id") % 5 === 0),
        docs.filter(col("doc_id") % 5 =!= 0))
    },
    // DoReMi-style domain reweighting (operators.Doremi): per-domain
    // excess bigram-LM loss (lossless e6 from the round-6 per-doc series)
    // → pseudo-exp multiplicative boost on a sqrt-temperature baseline,
    // uniform-smoothed; every sum an exact BIGINT, pexp the shared
    // 16-squaring kernel
    "q_doremi_weights" -> { (s, d) =>
      val docs = Tables(s, d).documents
      val loss = LmScore.score(docs, docs)
        .select(col("doc_id"),
          expr("-CAST(round(avg_logp * 1000000.0) AS BIGINT)").as("loss_e6"))
      graft.operators.Doremi.weights(docs, loss)
    },
    // multi-epoch DoReMi: the Hedge iteration against a MOVING α-weighted
    // baseline run to 3 epochs — integer baselines, integer excess, the
    // pseudo-exp boost per epoch; whole trajectory replayed epoch-per-CTE
    "q_doremi_epochs" -> { (s, d) =>
      val docs = Tables(s, d).documents
      val loss = LmScore.score(docs, docs)
        .select(col("doc_id"),
          expr("-CAST(round(avg_logp * 1000000.0) AS BIGINT)").as("loss_e6"))
      graft.operators.Doremi.epochWeights(docs, loss, epochs = 3)
    },
    // stateless twin: pruned LM collected into map literals, scoring is a
    // single zero-shuffle projection (the live-feed spelling — runs
    // unchanged on a stream in append mode with no state; see
    // LmScore.scoreStateless scaladoc for the driver-collect bound)
    "q_lm_score_stateless" -> { (s, d) =>
      val docs = Tables(s, d).documents
      LmScore.scoreStateless(docs, docs, minCount = 2L)
    },
    // benchmark decontamination: training docs (19/20 of the corpus) that
    // share ≥2 distinct 3-shingles with any "benchmark" doc (the other
    // 1/20) — shingle-explode + equi-join, never all-pairs
    "q_decontaminate" -> { (s, d) =>
      val docs = Tables(s, d).documents
      Decontaminate.overlaps(
        docs.filter(pmod(col("doc_id"), lit(20)) =!= 0),
        docs.filter(pmod(col("doc_id"), lit(20)) === 0),
        minShared = 2)
    },
    // graded contamination (operators.Decontaminate.overlapFraction): per
    // training doc, the fraction of its distinct shingles found anywhere
    // in the benchmark — the audit/threshold signal behind the boolean gate
    "q_decontaminate_frac" -> { (s, d) =>
      val docs = Tables(s, d).documents
      Decontaminate.overlapFraction(
        docs.filter(pmod(col("doc_id"), lit(20)) =!= 0),
        docs.filter(pmod(col("doc_id"), lit(20)) === 0))
    },
    // which sources mirror each other: per-shingle source sets exploded to
    // pairs (bounded by the source vocabulary) — never a source x source
    // join (Decontaminate.sourceOverlap)
    "q_source_overlap" -> { (s, d) =>
      Decontaminate.sourceOverlap(Tables(s, d).documents)
    },
    // large-benchmark spelling: Bloom prefilter (Spark's own
    // BloomFilterAggregate/MightContain, ~10 bits/shingle broadcast) + a
    // shuffled exact verify — identical output, so the same oracle
    "q_decontaminate_bloom" -> { (s, d) =>
      val docs = Tables(s, d).documents
      Decontaminate.overlapsViaBloom(
        docs.filter(pmod(col("doc_id"), lit(20)) =!= 0),
        docs.filter(pmod(col("doc_id"), lit(20)) === 0),
        minShared = 2)
    },
    // the whole curation pipeline in ONE call — per-doc flags from exact
    // dedup (md5-min window), quality (token count + Gopher dup-word
    // fraction), and benchmark decontamination, composed into the final
    // keep decision a corpus build would apply. Every stage is
    // deterministic, so the COMPOSITION is oracled end-to-end (the keep
    // comparison uses the unrounded dwf on both sides — bit-identical
    // IEEE arithmetic — while the reported column is round(.,6))
    // end-to-end curation decision ledger (operators.CurationLedger):
    // one row per doc with every stage verdict (bench hold-out, Gopher
    // A1.1 + A1.2 gates, exact-dup keeper, contamination) + final keep
    "q_curation_ledger" -> { (s, d) =>
      graft.operators.CurationLedger.ledger(Tables(s, d).documents)
    },
    // first-failing-stage yield waterfall over the ledger
    "q_curation_waterfall" -> { (s, d) =>
      graft.operators.CurationLedger.waterfall(Tables(s, d).documents)
    },
    "q_curation_report" -> { (s, d) =>
      val docs = Tables(s, d).documents
      val bench = docs.filter(pmod(col("doc_id"), lit(20)) === 0)
      val train = docs.filter(pmod(col("doc_id"), lit(20)) =!= 0)
      val contaminatedIds = Decontaminate.overlaps(train, bench, minShared = 2)
        .select(col("doc_id")).distinct()
        .withColumn("contaminated", lit(true))
      val dwf = Repetition.dupFrac(col("toks"))
      docs
        .select(col("doc_id"), TF.tokens(col("text")).as("toks"),
          md5(col("text")).as("h"))
        .withColumn("h_min", min(col("doc_id")).over(Window.partitionBy(col("h"))))
        .join(broadcast(contaminatedIds), Seq("doc_id"), "left")
        .select(
          col("doc_id"),
          (pmod(col("doc_id"), lit(20)) === 0).as("is_bench"),
          (col("doc_id") =!= col("h_min")).as("is_dup"),
          size(col("toks")).cast("long").as("n_tokens"),
          round(dwf, 6).as("dup_word_frac"),
          coalesce(col("contaminated"), lit(false)).as("contaminated"),
          (pmod(col("doc_id"), lit(20)) =!= 0 &&
            col("doc_id") === col("h_min") &&
            size(col("toks")) >= 20 && dwf <= 0.6 &&
            coalesce(col("contaminated"), lit(false)) === false).as("keep"))
    },
    // domain balancing: deterministic ≤50-docs-per-language cap, ranked by
    // md5(id) so the draw is stable across engines (operators.GroupCap)
    "q_group_cap" -> { (s, d) =>
      GroupCap.capPerGroup(
        Tables(s, d).documents.select(col("doc_id"), col("lang")), "lang", "doc_id", 50)
        .select(col("doc_id"), col("lang"), col("samp_rank"))
    },
    // deterministic negative sampling for implicit-feedback training
    // (operators.NegativeSampler): 5 unseen items per user via md5 hash
    // slots over the indexed item universe — never a users x items cross
    // join; fully engine-reproducible
    "q_negative_samples" -> { (s, d) =>
      val inter = Tables(s, d).events
        .select(col("user_id"),
          from_json(col("props"), lit("k INT")).getField("k").cast("long").as("item_id"))
        .filter(col("item_id").isNotNull)
      graft.operators.NegativeSampler.sample(inter, "user_id", "item_id", k = 5)
        .select(col("user_id"), col("item_id"), col("neg_rank"))
    },
    // fixed-iteration PageRank over the shingle near-dup graph
    // (operators.PageRank): which doc in a duplicate cluster is the hub —
    // 5 power-iteration rounds, round-9 state each round so both engines
    // carry identical floats
    "q_pagerank" -> { (s, d) =>
      val edges = shingleEdges(Tables(s, d).documents)
      graft.operators.PageRank.ranks(edges, "src", "dst", iterations = 5)
        .select(col("node").as("doc_id"), round(col("rank"), 6).as("pagerank"))
    },
    // HyperBall neighbourhood function (operators.HyperBall): per-node HLL
    // ball counters grown by register-MAX merges over the shingle graph —
    // the md5-48 sketch makes the whole 3-round trajectory hash-replayable
    "q_hyperball" -> { (s, d) =>
      graft.operators.HyperBall.neighborhoodFunction(
        shingleEdges(Tables(s, d).documents), rounds = 3)
    },
    // neighbourhood-function curve + effective diameter: N(t) = Σ_v est
    // ball sizes; reached90 flags t with N(t) ≥ 0.9·N(final) — the
    // four-degrees-of-separation readout, exact ×10/×9 integer compare
    "q_hyperball_diameter" -> { (s, d) =>
      val nf = graft.operators.HyperBall.neighborhoodFunction(
          shingleEdges(Tables(s, d).documents), rounds = 3)
        .groupBy(col("t")).agg(sum(col("est_e6")).as("nf_e6"))
      val fin = nf.filter(col("t") === 3).select(col("nf_e6").as("nf_fin"))
      nf.crossJoin(broadcast(fin))
        .select(col("t"), col("nf_e6"),
          (col("nf_e6") * 10 >= col("nf_fin") * 9).as("reached90"))
    },
    // contamination expansion via seeded PPR (operators.
    // PersonalizedPageRank): random walks restarting at the benchmark
    // docs (doc_id % 20 = 0, the Decontaminate convention) score
    // transitive proximity to the contaminated region; exact BIGINT mass
    // at scale 1e12, 4 rounds
    "q_ppr_contamination" -> { (s, d) =>
      val docs = Tables(s, d).documents
      graft.operators.PersonalizedPageRank.seededRanks(
        shingleEdges(docs),
        docs.filter(expr("doc_id % 20 = 0")).select(col("doc_id").as("node")))
    },
    // Neyman-allocation stratified sample (operators.StratifiedSample):
    // 200 events split across event types proportional to N_s*sigma_s —
    // variance from EXACT integer cents sums, md5-order membership
    "q_stratified_neyman" -> { (s, d) =>
      val ev = Tables(s, d).events
        .select(col("event_id"), col("event_type"), col("value"))
      graft.operators.StratifiedSample
        .neyman(ev, "event_type", "event_id", "value", totalN = 200)
    },
    // per-type winsorization (operators.Winsorize): clip value to the
    // [p01, p99] group fences — exact interpolated percentiles, fences
    // round-6 before the clip so boundary rows are engine-identical
    "q_winsorize" -> { (s, d) =>
      val ev = Tables(s, d).events
        .select(col("event_id"), col("event_type"), col("value"))
      graft.operators.Winsorize.clipPerGroup(ev, Seq("event_type"), "value")
        .select(col("event_id"), col("event_type"), col("value"),
          col("fence_lo"), col("fence_hi"), col("clipped"))
    },
    // per-type robust standardization (operators.RobustScale): median/MAD
    // z-scores — the outlier-immune scaler; med and mad round-6 BEFORE the
    // division, zero-MAD groups yield null z
    "q_robust_scale" -> { (s, d) =>
      val ev = Tables(s, d).events
        .select(col("event_id"), col("event_type"), col("value"))
      graft.operators.RobustScale.zScores(ev, Seq("event_type"), "value")
        .select(col("event_id"), col("event_type"), col("value"),
          col("med"), col("mad"), col("robust_z"))
    },
    // per-user value trend (operators.Trend): closed-form OLS over
    // (hours-since-first-event, value) from round-6 sufficient statistics
    // — one exchange, engine-bitwise-identical derived floats
    "q_trend_slopes" -> { (s, d) =>
      val ev = Tables(s, d).events
        .select(col("user_id"), col("ts").cast("long").as("ts_s"), col("value"))
      graft.operators.Trend.olsPerGroup(ev, Seq("user_id"), "ts_s", "value")
    },
    // capped co-occurrence (operators.CoOccur): item pairs sharing >= 2
    // users, each user's basket first capped to 20 md5-ranked items so a
    // hot user can't go quadratic — deterministic, engine-reproducible
    "q_copurchase" -> { (s, d) =>
      val inter = Tables(s, d).events
        .select(col("user_id"),
          from_json(col("props"), lit("k INT")).getField("k").cast("long").as("item_id"))
        .filter(col("item_id").isNotNull)
      graft.operators.CoOccur.pairs(inter, "user_id", "item_id",
        capPerUser = 20, minCount = 2L)
        .select(col("item_a"), col("item_b"), col("n_users"))
    },
    // ordered conversion funnel (operators.Funnel): first view, first
    // click at-or-after it, first purchase at-or-after that — chained
    // conditional-min windows over ONE user partition (single exchange,
    // no self-joins); micros arithmetic so both engines agree exactly
    // SCD Type-2 dimension build (operators.Scd2): each user's event_type
    // changelog collapsed to maximal validity intervals — one exchange for
    // change-detection lag, interval lead, and version number
    "q_scd2_intervals" -> { (s, d) =>
      val ev = Tables(s, d).events
        .select(col("user_id"), expr("ts_ns DIV 1000").as("ts_us"),
          col("event_id"), col("event_type"))
      graft.operators.Scd2.buildIntervals(
        ev, Seq("user_id"), "ts_us", "event_id", Seq("event_type"))
    },
    // triangle count + local clustering coefficient (operators.Triangles)
    // over the shingle near-dup graph: tight template clusters (c → 1)
    // vs boilerplate hubs (c → 0)
    "q_triangle_stats" -> { (s, d) =>
      graft.operators.Triangles.nodeStats(
        shingleEdges(Tables(s, d).documents))
    },
    // 2-core of the near-dup graph (operators.KCore): fixed-budget peel
    // with a monotone fixpoint early-exit — the dense template/boilerplate
    // core vs the long-tail periphery; exact integers end-to-end
    "q_kcore" -> { (s, d) =>
      graft.operators.KCore.peel(
        shingleEdges(Tables(s, d).documents), k = 2, rounds = 8)
    },
    // first-order Markov transitions (operators.Markov): P(next | cur)
    // over per-user event sequences, micros time + event_id tiebreak —
    // one window exchange, |states|²-bounded tail
    "q_markov_transitions" -> { (s, d) =>
      val ev = Tables(s, d).events
        .select(col("user_id"), col("event_type"),
          expr("ts_ns DIV 1000").as("ts_us"), col("event_id"))
      graft.operators.Markov.transitions(ev)
    },
    // deterministic SYNTHETIC-sequence generation from the observed chain
    // (operators.MarkovGen): 4-step inverse-CDF walks per user with md5 in
    // place of an engine RNG — every draw an exact integer bucket lookup,
    // so both engines replay the whole synthesis bit-for-bit
    "q_markov_generate" -> { (s, d) =>
      val ev = Tables(s, d).events
        .select(col("user_id"), col("event_type"),
          expr("ts_ns DIV 1000").as("ts_us"), col("event_id"))
      graft.operators.MarkovGen.generate(ev, steps = 4)
    },
    // Markov removal-effect attribution (operators.MarkovAttribution):
    // first-purchase-truncated journeys, 8 rounds of integer mass
    // propagation per chain (full + one per removed channel), bounded
    // driver fixed point — the whole solve replays in unrolled CTEs
    "q_markov_attribution" -> { (s, d) =>
      val ev = Tables(s, d).events
        .select(col("user_id"), col("event_type"),
          expr("ts_ns DIV 1000").as("ts_us"), col("event_id"))
      graft.operators.MarkovAttribution.attribution(s, ev)
    },
    // systematic PPS sampling (operators.SystematicSample): deterministic
    // size-proportional draw with multiplicity over the md5-ordered
    // corpus — running weights via PrefixSum (never a global window),
    // thresholds as exact BIGINT arithmetic
    "q_pps_sample" -> { (s, d) =>
      graft.operators.SystematicSample.ppsHits(
        Tables(s, d).documents, weightCol = "n_chars", idCol = "doc_id",
        targetN = 100)
    },
    // per-state conditional entropy of the Markov chain (stateEntropy):
    // H(next | cur) from exact count ratios — the predictability profile
    "q_markov_entropy" -> { (s, d) =>
      val ev = Tables(s, d).events
        .select(col("user_id"), col("event_type"),
          expr("ts_ns DIV 1000").as("ts_us"), col("event_id"))
      graft.operators.Markov.stateEntropy(graft.operators.Markov.transitions(ev))
    },
    // stationary distribution + entropy rate of the event-type chain
    // (Markov.stationary): fixed-round power iteration on the bounded
    // |states|² matrix, every float op replayed by the generated oracle
    "q_markov_stationary" -> { (s, d) =>
      val ev = Tables(s, d).events
        .select(col("user_id"), col("event_type"),
          expr("ts_ns DIV 1000").as("ts_us"), col("event_id"))
      graft.operators.Markov.stationary(
        graft.operators.Markov.transitions(ev), MarkovStatesList)
    },
    // classical additive seasonal decomposition (operators.Seasonal):
    // hourly value series split into 24h-MA trend + hour-of-day seasonal
    // + residual; series is bucket-bounded so the global sort is over the
    // time axis, never the fact table
    "q_seasonal_decompose" -> { (s, d) =>
      val series = Tables(s, d).events
        .groupBy(expr("CAST(ts AS LONG) DIV 3600").as("h"))
        .agg(round(avg(col("value")), 6).as("v"))
      graft.operators.Seasonal.decompose(series, "h", "v", period = 24)
    },
    // daily cohort retention matrix (operators.Cohorts): users cohorted by
    // first-active day, cell (cohort, offset) = distinct users active that
    // many days later + the cohort-normalized rate — two bounded shuffles,
    // no count-distinct Expand (per-user period sets fold in the first agg)
    "q_cohort_retention" -> { (s, d) =>
      val ev = Tables(s, d).events
        .select(col("user_id"), col("ts").cast("long").as("ts_s"))
      graft.operators.Cohorts.retention(ev, periodSeconds = 86400L)
    },
    // leave-one-out target encoding (operators.TargetEncode): per-event
    // user purchase-rate feature with the row's own label excluded — the
    // 0/1 label keeps every sufficient statistic an exact integer
    "q_target_encode_loo" -> { (s, d) =>
      val ev = Tables(s, d).events
        .select(col("event_id"), col("user_id"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
      graft.operators.TargetEncode.leaveOneOut(ev, Seq("user_id"), "y")
        .select(col("event_id"), col("user_id"), col("y"), col("te_n"),
          col("te_sum"), col("loo_rate"), col("loo_smoothed"))
    },
    "q_funnel" -> { (s, d) =>
      val ev = Tables(s, d).events
        .select(col("user_id"), col("event_type"), expr("ts_ns DIV 1000").as("ts_us"))
      graft.operators.Funnel
        .ordered(ev, "user_id", "event_type", "ts_us", Seq("view", "click", "purchase"))
        .select(col("user_id"), col("t_step1"), col("t_step2"), col("t_step3"),
          col("stage"),
          (col("t_step2") - col("t_step1")).as("us_view_to_click"),
          (col("t_step3") - col("t_step2")).as("us_click_to_purchase"))
    },
    // the native stream-stream interval join (streaming.StreamStreamJoin)
    // run on the static frames — identical join expression both regimes
    // (withWatermark is a batch no-op); the streaming execution is
    // spec-pinned (StreamingSymmetricHashJoin parity)
    "q_stream_join" -> { (s, d) =>
      val ev = Tables(s, d).events
        .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      graft.streaming.StreamStreamJoin.attributed(
        ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts")),
        ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("buy_id"), col("ts").as("buy_ts")))
    },
    // the LEFT OUTER stream-stream join's batch twin: unmatched views
    // carry null (buy_id, lag_us) — live, the watermark-eviction trigger
    // emits exactly these rows (StreamStreamJoinSpec pins that); the
    // batch plan is a plain left outer interval join, oracled
    "q_stream_join_outer" -> { (s, d) =>
      val ev = Tables(s, d).events
        .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      graft.streaming.StreamStreamJoin.attributedOuter(
        ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts")),
        ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("buy_id"), col("ts").as("buy_ts")))
    },
    // transformWithState (streaming.TwsActivity, the Spark 4 arbitrary-
    // state API) run statically: every key's rows arrive as one group, so
    // the emitted totals must equal a plain groupBy count — the new API's
    // batch parity hash-oracled; the spec drives the RocksDB streaming path
    "q_tws_counts" -> { (s, d) =>
      import s.implicits._
      graft.streaming.TwsActivity.activity(
        Tables(s, d).events.select(col("user_id"), col("event_type"))
          .as[graft.streaming.TwsActivity.Click])
        .toDF()
    },
    // MapState + ListState surface of transformWithState (TwsBasket):
    // per-type counts in a MapState, top-3 purchase cents in a ListState
    // (top-K by VALUE, order-free — that's what makes batch parity
    // hash-oracleable); the spec drives the RocksDB streaming path
    "q_tws_basket" -> { (s, d) =>
      import s.implicits._
      graft.streaming.TwsBasket.stats(
        Tables(s, d).events.select(col("user_id"), col("event_type"),
            coalesce(floor(col("value") * lit(100.0) + lit(0.5)).cast("long"),
              lit(0L)).as("value_cents"))
          .as[graft.streaming.TwsBasket.Act])
        .toDF()
    },
    // Apriori k=2 association rules (operators.BasketRules): support /
    // both confidences / lift on the SAME capped graph as q_copurchase
    "q_basket_rules" -> { (s, d) =>
      val inter = Tables(s, d).events
        .select(col("user_id"),
          from_json(col("props"), lit("k INT")).getField("k").cast("long").as("item_id"))
        .filter(col("item_id").isNotNull)
      graft.operators.BasketRules.rules(inter, "user_id", "item_id",
        capPerUser = 20, minCount = 2L)
    },
    // the live bottom-k sample operator (streaming.StreamBottomK) run
    // statically — the monotone mergeable summary means the batch
    // emission IS the exact bottom-k per group, so the streaming
    // operator itself is driver-gated (the q_tws_counts pattern); v is
    // functionally dependent on member (user_id), so the dedup-on-member
    // fold is order-free
    "q_stream_bottomk" -> { (s, d) =>
      import s.implicits._
      graft.streaming.StreamBottomK.samples(
        Tables(s, d).events
          .select(col("event_type").as("group"),
            col("user_id").cast("string").as("member"),
            col("user_id").cast("long").as("v"))
          .as[graft.streaming.StreamBottomK.Obs],
        k = 64).toDF()
    },
    // the streaming funnel operator (streaming.StreamingFunnel) run
    // statically — one batch per user group, so the emitted final states
    // must equal the batch chained-min funnel (the stream/batch parity the
    // spec pins, here oracled end-to-end); stage-0 users emit nothing
    "q_funnel_stream" -> { (s, d) =>
      import s.implicits._
      val ev = Tables(s, d).events
        .select(col("user_id"), col("event_type"),
          expr("ts_ns DIV 1000").as("ts_us"))
        .as[graft.streaming.StreamingFunnel.Event]
      graft.streaming.StreamingFunnel.funnel(ev, Seq("view", "click", "purchase"))
        .toDF()
        .select(col("user_id"),
          array_join(expr("transform(times, x -> cast(x AS string))"), ",")
            .as("times_str"),
          col("stage").cast("long").as("stage"))
    },
    // funnel time-to-convert percentiles (operators.Quantiles): exact
    // interpolated p25/p50/p75/p90 of the step gaps via the rank-bracket
    // spelling — engine built-in quantiles diverge by >1 ulp on 1e10-scale
    // micro gaps, so the interpolation is replayed term-for-term instead
    "q_funnel_quantiles" -> { (s, d) =>
      val ev = Tables(s, d).events
        .select(col("user_id"), col("event_type"), expr("ts_ns DIV 1000").as("ts_us"))
      val f = graft.operators.Funnel
        .ordered(ev, "user_id", "event_type", "ts_us", Seq("view", "click", "purchase"))
      val gaps = f.select(explode(map(
        lit("view_to_click"), col("t_step2") - col("t_step1"),
        lit("click_to_purchase"), col("t_step3") - col("t_step2"))).as(Seq("gap", "v")))
      graft.operators.Quantiles.byGroup(gaps, "gap", "v", Seq(25, 50, 75, 90))
    },
    // distribution drift per event type vs the pooled rest
    // (operators.Drift): bucketed two-sample KS + PSI on a fixed 64-bucket
    // grid — integer bucket counts make the CDFs engine-exact
    "q_drift_by_type" -> { (s, d) =>
      graft.operators.Drift.vsRest(
        Tables(s, d).events.select(col("event_type"), col("value")),
        "event_type", "value", nBuckets = 64)
    },
    // 1-Wasserstein drift per event type vs the pooled rest on the same
    // 64-bucket grid — exact BIGINT CDF-gap sums, ONE double expression
    // at the end (value-units drift, complementing KS/PSI/JSD)
    "q_wasserstein_drift" -> { (s, d) =>
      graft.operators.Drift.wassersteinVsRest(
        Tables(s, d).events.select(col("event_type"), col("value")),
        "event_type", "value", nBuckets = 64)
    },
    // debiased Sinkhorn OT divergence per event type vs the pooled rest
    // (operators.Sinkhorn): shared 64-bucket histograms, literal Gibbs
    // kernel micros, 3×5 unrolled BIGINT-nanos solves, div2 = 2S(a,b) −
    // S(a,a) − S(b,b) in pure integer subtraction
    "q_sinkhorn_divergence" -> { (s, d) =>
      graft.operators.Sinkhorn.vsRest(s,
        Tables(s, d).events.select(col("event_type"), col("value")),
        "event_type", "value")
    },
    // trailing-window anomaly detection (operators.Anomaly): each
    // (type, hour) event count z-scored against its previous 24 observed
    // hours — bounded ROWS frame per key, flag from the round-6 z so the
    // threshold boundary is engine-identical
    "q_anomaly_zscore" -> { (s, d) =>
      val hourly = Tables(s, d).events
        .select(col("event_type"), col("ts").cast("long").as("ts_s"))
        .withColumn("h", expr("ts_s DIV 3600"))
        .groupBy(col("event_type"), col("h")).agg(count(lit(1)).as("n_events"))
      graft.operators.Anomaly
        .trailingZScores(hourly, Seq("event_type"), "h", "n_events")
        .select(col("event_type"), col("h"), col("n_events"), col("trailing_n"),
          round(col("trailing_mean"), 6).as("trailing_mean"),
          round(col("trailing_std"), 6).as("trailing_std"),
          round(col("z"), 6).as("z"), col("is_anomaly"))
    },
    // retrieval eval harness (operators.RankingEval): score the
    // deterministic activity-rank recommendation (items by event count per
    // user) against purchase ground truth — per-user recall@10, MRR, nDCG
    "q_ranking_metrics" -> { (s, d) =>
      val inter = Tables(s, d).events
        .select(col("user_id"), col("event_type"),
          from_json(col("props"), lit("k INT")).getField("k").cast("long").as("item_id"))
        .filter(col("item_id").isNotNull)
      val ranked = inter.groupBy(col("user_id"), col("item_id"))
        .agg(count(lit(1)).as("n"))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("user_id")).orderBy(col("n").desc, col("item_id"))))
        .filter(col("rank") <= 10)
      val rel = inter.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("item_id"))
      graft.operators.RankingEval.metrics(ranked, rel, k = 10, "user_id", "item_id")
        .select(col("user_id"), col("n_rel"), col("hits"),
          round(col("recall_at_k"), 6).as("recall_at_k"),
          round(col("mrr"), 6).as("mrr"),
          round(col("ndcg_at_k"), 6).as("ndcg_at_k"))
    },
    // unbroadcastable-catalog negative sampling: same hash-slot draw, but
    // the universe index is bucketed (no global sort) and the slot→item
    // resolution is a shuffled equi-join — nothing about the item catalog
    // is broadcast, so it survives a billion-item catalog
    "q_negative_samples_scalable" -> { (s, d) =>
      val inter = Tables(s, d).events
        .select(col("user_id"),
          from_json(col("props"), lit("k INT")).getField("k").cast("long").as("item_id"))
        .filter(col("item_id").isNotNull)
      graft.operators.NegativeSampler.sampleScalable(
        inter, "user_id", "item_id", k = 5, indexBuckets = 64)
        .select(col("user_id"), col("item_id"), col("neg_rank"))
    },
    // KEYED range join: assign every event to ITS user's containing
    // gap-session by time range — shuffle key (user_id, bucket), residual
    // BETWEEN; each event matches exactly one session by construction
    "q_event_sessions" -> { (s, d) =>
      val sess = gapSessionBounds(s, d)
      val ev = Tables(s, d).events
        .select(col("event_id"), col("user_id"), col("ts").cast("long").as("ts_s"))
      graft.operators.RangeJoin
        .pointInInterval(ev, "ts_s", sess, "start_s", "end_s", 3600L,
          keyCols = Seq("user_id"))
        .select(col("event_id"), col("user_id"), col("session_idx"))
    },
    // pair-producing range join (operators.RangeJoin): which sessions span
    // each hour mark — planned as a bucket equi-join, never a nested loop
    "q_range_join" -> { (s, d) =>
      val sess = gapSessionBounds(s, d)
      val marks = sess.select((expr("start_s DIV 3600") * 3600).as("mark_s")).distinct()
      graft.operators.RangeJoin
        .pointInInterval(marks, "mark_s", sess, "start_s", "end_s", 3600L)
        .select(col("mark_s"), col("user_id"), col("session_idx"))
    },
    // Morton/z-order key — the multi-dim clustering projection behind
    // Sinks-style zone-map layouts (operators.ZOrder): pure shift/mask
    // integer arithmetic, zero shuffle, engine-identical
    "q_zorder_key" -> { (s, d) =>
      Tables(s, d).lineitem.select(col("l_orderkey"), col("l_linenumber"),
        graft.operators.ZOrder.zkey2(col("l_partkey"), col("l_suppkey")).as("zkey"))
    },
    // rendezvous (HRW) sharding: shard = argmax over shards of
    // md5-48(shard || '_' || key) — consistent assignment where growing
    // 10 -> 11 shards moves only ~1/11 of keys (measured per shard as
    // n_moved); the cache/shard-topology-change story, zero shuffle
    // before the final rollup. Ties (md5-collision-impossible, spelled
    // anyway) break to the smaller shard on both engines
    "q_rendezvous_shards" -> { (s, d) =>
      def assign(n: Int): Column = {
        val scores = (0 until n).map { i =>
          struct(
            HashSplit.md548(concat(lit(i.toString), lit("_"),
              col("doc_id").cast("string"))).as("h"),
            lit(-i).as("ns"))
        }
        -array_max(array(scores: _*)).getField("ns")
      }
      Tables(s, d).documents
        .select(col("doc_id"), assign(10).as("s10"), assign(11).as("s11"))
        .groupBy(col("s10").as("shard"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("s10") =!= col("s11"), 1L).otherwise(0L)).as("n_moved"))
    },
    // dataset-versioning diff: content-hash compare of two snapshots via
    // one full-outer join on the id — added/removed/changed/unchanged
    // counts, the audit row a corpus release publishes. Snapshot B is a
    // deterministic derivation (drop %11, mutate %7, add %13 re-keyed)
    "q_snapshot_diff" -> { (s, d) =>
      val a = Tables(s, d).documents.select(col("doc_id"), col("text"))
      val b0 = a.filter(pmod(col("doc_id"), lit(11)) =!= 0)
        .select(col("doc_id"),
          when(pmod(col("doc_id"), lit(7)) === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
      val bNew = a.filter(pmod(col("doc_id"), lit(13)) === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit(" new")).as("text"))
      val b = b0.unionByName(bNew)
      a.select(col("doc_id"), md5(col("text")).as("ha"))
        .join(b.select(col("doc_id"), md5(col("text")).as("hb")),
          Seq("doc_id"), "full_outer")
        .select(when(col("ha").isNull, "added")
          .when(col("hb").isNull, "removed")
          .when(col("ha") === col("hb"), "unchanged")
          .otherwise("changed").as("status"))
        .groupBy(col("status")).agg(count(lit(1)).as("n"))
    },
    // Zipf rank-frequency slope over the top-100 vocabulary: OLS of
    // ln(freq) on ln(rank) with every ln term quantized to integer micros
    // BEFORE the sums (the NMI ln-replay discipline) — num/den are exact
    // BIGINTs, slope is ONE replayed float division floor-6. Natural text
    // sits near -1; synthetic/boilerplate corpora flatten — a cheap
    // distribution-shift fingerprint
    "q_zipf_slope" -> { (s, d) =>
      graft.operators.Zipf.slopes(Tables(s, d).documents)
    },
    // per-source Zipf slopes — the per-domain variant of q_zipf_slope
    // (one shared operators.Zipf pipeline so the ln-replay discipline
    // cannot drift between the two spellings)
    "q_zipf_by_source" -> { (s, d) =>
      graft.operators.Zipf.slopes(Tables(s, d).documents, groupCols = Seq("source"))
    },
    // Zipf-slope drift across consecutive corpus slices (the monitoring
    // view the PSI family gives numeric columns, applied to the rank-
    // frequency fingerprint): 8 equal doc-order windows (q_vocab_growth's
    // decile spelling), per-window slope through the SHARED Zipf pipeline,
    // drift = slope delta vs the previous window as exact e6 integers —
    // a flattening delta flags template/boilerplate contamination in new
    // data. The only unpartitioned window runs over the 8 slice rows.
    "q_zipf_drift" -> { (s, d) =>
      val docs = Tables(s, d).documents
      val tot = docs.agg(count(lit(1)).as("n_docs"))
      val sliced = docs.crossJoin(broadcast(tot))
        .withColumn("win", expr("doc_id * 8 DIV n_docs"))
      val slopeE6 = when(col("den") === 0L, lit(0L))
        .otherwise(floor(col("num").cast("double") / col("den").cast("double")
          * lit(1000000.0d) + lit(0.5d)).cast("long"))
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("win"))
      graft.operators.Zipf.slopes(sliced, groupCols = Seq("win"))
        .withColumn("slope_e6", slopeE6)
        .withColumn("drift_e6", col("slope_e6") - lag(col("slope_e6"), 1).over(w))
        .select(col("win"), col("nw"), col("slope_e6"), col("drift_e6"))
    },
    // C4-style blocklist content filter: word-boundary hits counted over
    // the SAME token spelling every text operator shares; keep = any-hit
    // drop (the C4 policy) — zero-shuffle projection
    "q_blocklist_filter" -> { (s, d) =>
      val toks = TF.tokens(col("text"))
      val hits = size(filter(toks, t => t.isin("slow", "big")))
      Tables(s, d).documents.select(
        col("doc_id"), size(toks).as("n_tokens"),
        hits.as("n_hits"), (hits === 0).as("keep"))
    },
    // leak-aware temporal split: train < cutoff (80% of the time span),
    // a 1-hour embargo gap absorbing boundary leakage (labels computed
    // from post-cutoff windows), test after — exact integer second
    // arithmetic on the shared epoch spelling
    "q_temporal_split" -> { (s, d) =>
      val ev = Tables(s, d).events.select(col("ts").cast("long").as("ts_s"))
      val bounds = ev.agg(min(col("ts_s")).as("t0"), max(col("ts_s")).as("t1"))
      ev.crossJoin(broadcast(bounds))
        .withColumn("cut", expr("t0 + (t1 - t0) * 8 DIV 10"))
        .withColumn("split",
          when(col("ts_s") < col("cut"), "train")
            .when(col("ts_s") < col("cut") + 3600L, "embargo")
            .otherwise("test"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"), min(col("ts_s")).as("min_ts_s"),
          max(col("ts_s")).as("max_ts_s"))
    },
    // group k-fold: fold = md5-bucket(user) mod 5 — leak-free CV folds
    // (every session of a user in one fold), portable-hash spelling
    "q_kfold_assign" -> { (s, d) =>
      Tables(s, d).events
        .select(HashSplit.fold(col("user_id"), 5).as("fold"), col("user_id"))
        .groupBy(col("fold"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
    },
    // Heaps-law vocabulary-growth curve: distinct 3-shingles first seen in
    // each corpus decile (by doc order) + the cumulative curve — the
    // saturation diagnostic that says whether more data still adds new
    // content or just duplicates; one explode + shingle-keyed min, the
    // only unpartitioned window runs over the 10 decile rows
    "q_vocab_growth" -> { (s, d) =>
      val docs = Tables(s, d).documents
      val tot = docs.agg(count(lit(1)).as("n_docs"))
      val perDecile = docs.crossJoin(broadcast(tot))
        .select(expr("doc_id * 10 DIV n_docs").as("decile"),
          explode(graft.operators.Dedup.shingles(col("text"))).as("sh"))
        .groupBy(col("sh")).agg(min(col("decile")).as("first_decile"))
        .groupBy(col("first_decile")).agg(count(lit(1)).as("n_new"))
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("first_decile"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      perDecile.withColumn("cum_distinct", sum(col("n_new")).over(w))
        .select(col("first_decile"), col("n_new"), col("cum_distinct"))
    },
    // per-source Heaps curves: the q_vocab_growth decile spelling
    // partitioned by source — the per-domain dedup-saturation diagnostic
    // (sibling of q_zipf_by_source). Deciles come from the per-source doc
    // rank; the rank/count windows hash-partition on source (never a
    // single-partition sort), and the cumulative window runs over ≤ 10
    // decile rows per source.
    "q_vocab_growth_by_source" -> { (s, d) =>
      val W = org.apache.spark.sql.expressions.Window
      val docs = Tables(s, d).documents
      val ranked = docs
        .select(col("source"), col("doc_id"), col("text"))
        .withColumn("rk",
          row_number().over(W.partitionBy(col("source")).orderBy(col("doc_id"))))
        .withColumn("nsrc", count(lit(1)).over(W.partitionBy(col("source"))))
      val perDecile = ranked
        .select(col("source"), expr("(rk - 1) * 10 DIV nsrc").as("decile"),
          explode(graft.operators.Dedup.shingles(col("text"))).as("sh"))
        .groupBy(col("source"), col("sh")).agg(min(col("decile")).as("first_decile"))
        .groupBy(col("source"), col("first_decile")).agg(count(lit(1)).as("n_new"))
      val cw = W.partitionBy(col("source")).orderBy(col("first_decile"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
      perDecile.withColumn("cum_distinct", sum(col("n_new")).over(cw))
        .select(col("source"), col("first_decile"), col("n_new"), col("cum_distinct"))
    },
    // zone-map pruning estimator (operators.ZoneMaps): simulate 1000-row
    // files under insertion order vs Z-order, build per-file min/max, and
    // score a range-predicate battery — the measured fraction of files a
    // lake format would skip under each layout
    "q_zonemap_pruning" -> { (s, d) =>
      import graft.operators.ZoneMaps
      val li = Tables(s, d).lineitem.withColumn("zkey",
        graft.operators.ZOrder.zkey2(col("l_partkey"), col("l_suppkey")))
      ZoneMaps.report(
        li,
        layouts = Seq(
          "natural" -> Seq("l_orderkey", "l_linenumber"),
          "zorder" -> Seq("zkey", "l_orderkey", "l_linenumber")),
        fileRows = 1000,
        statCols = Seq("l_partkey", "l_suppkey"),
        preds = Seq(
          ZoneMaps.RangePred("partkey_100_150", "l_partkey", 100L, 150L),
          ZoneMaps.RangePred("suppkey_1_5", "l_suppkey", 1L, 5L),
          ZoneMaps.RangePred("partkey_point_77", "l_partkey", 77L, 77L)))
    },
    // 3-dimensional Morton key (ZOrder.zkeyN): bit i of dim j at position
    // i*3 + j — the projection behind >2-dim clustered writes; still pure
    // integer shift/mask, zero shuffle, engine-identical
    "q_zorder3_key" -> { (s, d) =>
      Tables(s, d).lineitem.select(col("l_orderkey"), col("l_linenumber"),
        graft.operators.ZOrder.zkeyN(
          Seq(col("l_partkey"), col("l_suppkey"), col("l_linenumber")), 16).as("zkey3"))
    },
    // Hilbert index (operators.Hilbert): the better-locality sibling of
    // q_zorder_key — unrolled xy2d rotate-and-flip, one named projection
    // per bit level, zero shuffle, pure integer arithmetic
    "q_hilbert_key" -> { (s, d) =>
      graft.operators.Hilbert.withKey(
        Tables(s, d).lineitem
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_partkey"), col("l_suppkey")),
        "l_partkey", "l_suppkey", "hkey", bits = 16)
        .select(col("l_orderkey"), col("l_linenumber"), col("hkey"))
    },
    // temperature-flattened mixture (alpha = 0.5): w_s = sqrt(n_s/N) per
    // source, then the deterministic md5-order rebalance — low-resource
    // sources up-weighted without hand-tuned numbers (XLM-R/mBERT trick);
    // weights rounded to 6 decimals so DuckDB reproduces the quota math
    "q_mixture_temperature" -> { (s, d) =>
      val docs = Tables(s, d).documents.select(col("doc_id"), col("source"))
      val w = Mixture.temperatureWeights(docs, "source", 0.5)
      Mixture.rebalance(docs, "source", "doc_id", w)
        .select(col("doc_id"), col("source"), col("samp_rank"), col("keep_n"))
    },
    // weighted curation draw: 20 docs per source, inclusion probability
    // proportional to (n_chars + 1) — Efraimidis–Spirakis race with a
    // md5-derived uniform, so membership is deterministic and DuckDB
    // replicates it with identical arithmetic (operators.WeightedSample).
    // Shipped spelling is the bounded-heap aggregate (map-side-combining
    // MinKByAgg — ≤ 20 pairs/source/partition through the shuffle, no
    // full-group sort), hash-matched against the same oracle as the
    // window path — the equivalence the spec also pins.
    // deterministic weighted-fair training order (operators.Interleave):
    // WFQ virtual finish times v = (md5_rank · 10⁹) DIV w_micros with
    // temperature weights computed in-plan; global position via the
    // PrefixSum distributed rank
    "q_training_order" -> { (s, d) =>
      graft.operators.Interleave.trainingOrder(Tables(s, d).documents)
    },
    "q_weighted_sample" -> { (s, d) =>
      WeightedSample.samplePerGroupAtScale(
        Tables(s, d).documents.select(col("doc_id"), col("source"),
          (col("n_chars") + 1).cast("double").as("w")),
        "source", "doc_id", "w", 20)
        .select(col("doc_id"), col("source"), col("es_rank"))
    },
    // PII counts + redaction; the text is spiked with one synthetic
    // email/URL/IP per doc (id-derived, reproducible in the oracle) so the
    // regexes demonstrably fire — base documents carry no PII
    "q_pii_scrub" -> { (s, d) =>
      val spiked = Tables(s, d).documents.select(
        col("doc_id"),
        concat(col("text"),
          lit(" contact: user"), col("doc_id").cast("string"),
          lit("@example.com http://site"), col("doc_id").cast("string"),
          lit(".org 10.0.0."), pmod(col("doc_id"), lit(256)).cast("string")).as("text"))
      PiiScrub.profile(spiked)
    },
    // extended PII battery: display-format phones + 13-19-digit payment-card
    // candidates gated by the Luhn mod-10 checksum (an integer HOF fold,
    // spelled identically in the oracle). Spiked like q_pii_scrub: one phone
    // and two 16-digit card runs per doc, id-derived — whether each card
    // passes Luhn varies with doc_id, so the gate demonstrably separates
    "q_pii_scrub2" -> { (s, d) =>
      val id2 = lpad(pmod(col("doc_id"), lit(100)).cast("string"), 2, "0")
      val spiked = Tables(s, d).documents.select(
        col("doc_id"),
        concat(col("text"),
          lit(" ph (5"), id2, lit(") 555-01"), id2,
          lit(" card 4"), lpad(col("doc_id").cast("string"), 15, "0"),
          lit(" alt 5"), lpad((col("doc_id") * 3 + 1).cast("string"), 15, "0")).as("text"))
      PiiScrub.profile2(spiked)
    },
    // Unicode NFC normalization (expressions.UnicodeNorm): canonical
    // composition as a native codegen'd kernel — the pre-hash transform
    // that stops decomposed/precomposed spellings leaking past dedup.
    // Spiked per doc_id%3 with decomposed, precomposed, and plain tails
    "q_normalize_text" -> { (s, d) =>
      import graft.expressions.UnicodeNorm
      val spiked = Tables(s, d).documents.select(
        col("doc_id"),
        concat(col("text"),
          when(pmod(col("doc_id"), lit(3)) === 0,
            lit(" cafe\u0301 A\u030Angstro\u0308m"))
            .when(pmod(col("doc_id"), lit(3)) === 1, lit(" caf\u00E9"))
            .otherwise(lit(" plain"))).as("text"))
      spiked.select(
        col("doc_id"),
        UnicodeNorm.nfc(col("text")).as("norm_text"),
        (UnicodeNorm.nfc(col("text")) =!= col("text")).as("changed"),
        length(col("text")).as("len_raw"),
        length(UnicodeNorm.nfc(col("text"))).as("len_norm"))
    },
    // join-key skew profiler (operators.SkewProfile): hottest-key mass,
    // skew ratio vs the mean, and the salt modulus that would cap a task
    // at 1000 rows — user_id is near-uniform, event_type is 5-key-hot
    "q_skew_profile" -> { (s, d) =>
      graft.operators.SkewProfile.profile(
        Tables(s, d).events, Seq("user_id", "event_type"), targetRowsPerTask = 1000L)
    },
    // Deequ-style declarative data-quality report (operators.DataQuality):
    // completeness / range / domain / uniqueness constraints in ONE
    // aggregation pass + an anti-join FK check. Violations are injected
    // deterministically (id-derived, reproduced in the oracle) — the clean
    // tables would make every verdict a trivial pass
    "q_dq_report" -> { (s, d) =>
      val t = Tables(s, d)
      val dirty = t.events.select(
        when(pmod(col("event_id"), lit(101)) === 0, lit(0L))
          .otherwise(col("event_id")).as("event_id"),
        when(pmod(col("event_id"), lit(97)) === 0, lit(null).cast("long"))
          .otherwise(col("user_id")).as("user_id"),
        when(pmod(col("event_id"), lit(89)) === 0, col("user_id") + 10000000L)
          .otherwise(col("user_id")).as("fk_user_id"),
        when(pmod(col("event_id"), lit(71)) === 0, upper(col("event_type")))
          .otherwise(col("event_type")).as("event_type"),
        when(pmod(col("event_id"), lit(53)) === 0, -col("value") - 1.0)
          .otherwise(col("value")).as("value"))
      val checks = Seq(
        "complete_user_id" -> col("user_id").isNull,
        "value_nonnegative" -> (col("value") < 0.0),
        "event_type_domain" ->
          !col("event_type").isin("view", "click", "purchase", "signup", "error"))
      graft.operators.DataQuality.finish(
        graft.operators.DataQuality.report(dirty, checks, uniqueCols = Seq("event_id"))
          .unionByName(graft.operators.DataQuality.fkViolations(
            dirty, "fk_user_id", t.customer, "c_custkey", "fk_user_customer")))
    },
    // content-hash train/val/test assignment — stable across runs and
    // engines, duplicate texts co-locate in one split (operators.HashSplit)
    "q_hash_split" -> { (s, d) =>
      HashSplit.assign(Tables(s, d).documents.select(col("doc_id"), col("text")), "text")
        .select(col("doc_id"), col("bucket"), col("split"))
    },
    // SemDeDup: k-means-clustered cosine dedup; clustering is
    // engine-specific (rows-only check) — planted-duplicate recall and
    // keep-first retention are pinned in SemanticDedupSpec
    "q_semantic_dedup" -> { (s, d) =>
      // nClusters follows the IVF sqrt(n) rule-of-thumb (32 ≈ sqrt(1k..10k)
      // at bench scales): pair work per cluster shrinks quadratically with
      // cluster count, which is what bounds the self-join at corpus scale
      SemanticDedup.dedup(Tables(s, d).embeddings, threshold = 0.9, nClusters = 32)
        .groupBy(col("label")).agg(count(lit(1)).as("n_survivors"))
    },
    // deterministic-assignment twin of semantic dedup: cluster_id is a pure
    // function of the id, so the capped pairing + cosine-threshold math
    // hash-matches a SQL oracle (k-means assignment itself can't)
    "q_semdedup_subset" -> { (s, d) =>
      val emb = Tables(s, d).embeddings
        .withColumn("cluster_id", pmod(col("vec_id"), lit(50)).cast("int"))
      SemanticDedup.pairsWithin(emb, threshold = 0.2)
        .select(col("id1"), col("id2"), round(col("cos"), 6).as("cos"))
    },
    // FULL SemDeDup pipeline deterministic (the q_knn_ivf_det pattern):
    // KMeansReplay GEOMETRY clustering → within-cluster cosine pairs →
    // keep-first survivors per label, over a 2000-vector subset with
    // planted duplicates so drops provably flow end to end; the MLlib
    // q_semantic_dedup above stays the perf twin
    "q_semantic_dedup_det" -> { (s, d) =>
      val base = Tables(s, d).embeddings
        .select(col("vec_id"), col("embedding"), col("label"))
      val corpus = base.filter(col("vec_id") < 2000)
        .unionByName(base.filter(col("vec_id").between(1, 3))
          .select((-col("vec_id")).as("vec_id"), col("embedding"), col("label")))
      SemanticDedup.dedupDeterministicSurvivors(
        s, corpus, "label", d = 64, k = 8, rounds = 3, threshold = 0.9)
    },
    // Gopher/C4-family repetition filters — one codegen'd projection,
    // zero shuffle (operators.Repetition)
    "q_repetition_scores" -> { (s, d) =>
      Repetition.scores(Tables(s, d).documents.select(col("doc_id"), col("text")))
    },
    // as-of join: each purchase attributed to the user's most recent
    // at-or-before view, via the one-shuffle union-scan spelling
    // (operators.AsOfJoin). Time axis is MICROSECONDS on both sides:
    // DuckDB 1.0 truncates parquet TIMESTAMP(NANOS) to micros at scan
    // (every epoch_ns(ts) % 1000 = 0), so an oracle over nanos is
    // unreachable — and ordering must use the truncated value too, or a
    // micro-level tie the nanos disambiguated picks different views per
    // engine. Integer DIV, not /: ts_ns ~1e18 exceeds double's 2^53.
    "q_asof_attribution" -> { (s, d) =>
      val ev = Tables(s, d).events
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), expr("ts_ns DIV 1000").as("ts_us"),
          col("event_id").as("purchase_id"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), expr("ts_ns DIV 1000").as("ts_us"),
          col("event_id").as("view_id"),
          expr("ts_ns DIV 1000").as("view_ts_us"))
      AsOfJoin.asOf(purchases, views, "user_id", "ts_us", "view_id", Seq("view_id", "view_ts_us"))
        .select(col("purchase_id"), col("user_id"), col("view_id"),
          (col("ts_us") - col("view_ts_us")).as("gap_us"))
    },
    "q_tfidf_top_terms" -> { (s, d) =>
      graft.operators.TfIdf.topTerms(Tables(s, d).documents, k = 3)
    },
    // exact Jaccard-threshold self-join (operators.SimilarityJoin):
    // AllPairs/PPJoin prefix filtering — every pair ≥ 0.6, NO LSH false
    // negatives, never an all-pairs join; spec proves ≡ naive exhaustively
    "q_similarity_join" -> { (s, d) =>
      graft.operators.SimilarityJoin.jaccardSelfJoin(
        Tables(s, d).documents, threshold = 0.6)
    },
    // dedup method-agreement audit (Lee 2021's NearDup-vs-ExactSubstr
    // comparison): docs flagged by the exact-Jaccard near-dup join vs docs
    // with duplicated substring spans — overlap and Jaccard of the flag
    // sets, the curation diagnostic for choosing/combining detectors.
    // Bench adjudication (r18 verdict #1, driver median 5.47 -> 10.66 s
    // r17 -> r18 on unchanged code): r19 TimeQ isolation at sf0.1, 5 reps:
    // 3.76/2.91/2.74/2.66/2.65 (median 2.74), with the stage queries at
    // q_similarity_join 1.66 / q_substring_spans 1.60 in the same session
    // — the combined plan is CHEAPER than the stage sum (shared scan), so
    // the driver number is host load on a GC-heavy query, the
    // SimilarityJoin r10/r17 precedent. Structural trim applied anyway:
    // the flag set only needs MEMBERSHIP, so the substring side now uses
    // duplicatedDocIds (no per-doc sort window, no island groupBy).
    "q_dedup_method_overlap" -> { (s, d) =>
      val docs = Tables(s, d).documents
      val pairs = graft.operators.SimilarityJoin.jaccardSelfJoin(docs, threshold = 0.6)
      // one subtree, one PPJoin execution: explode both endpoints from a
      // single read of the expensive similarity join (a two-branch union
      // would re-run the prefix-filter join once per branch)
      val pp = pairs
        .select(explode(array(col("id1"), col("id2"))).as("doc_id")).distinct()
        .withColumn("in_pp", lit(true))
      val ss = graft.operators.SubstringDedup.duplicatedDocIds(docs, w = 8)
        .withColumn("in_ss", lit(true))
      pp.join(ss, Seq("doc_id"), "full_outer")
        .select(coalesce(col("in_pp"), lit(false)).as("in_pp"),
          coalesce(col("in_ss"), lit(false)).as("in_ss"))
        .agg(
          coalesce(sum(when(col("in_pp"), 1L).otherwise(0L)), lit(0L)).as("n_neardup"),
          coalesce(sum(when(col("in_ss"), 1L).otherwise(0L)), lit(0L)).as("n_substr"),
          coalesce(sum(when(col("in_pp") && col("in_ss"), 1L).otherwise(0L)), lit(0L)).as("n_both"),
          count(lit(1)).as("n_either"))
        .select(col("n_neardup"), col("n_substr"), col("n_both"), col("n_either"),
          when(col("n_either") === 0L, 0L)
            .otherwise(expr("n_both * 1000000 DIV n_either")).as("agreement_e6"))
    },
    // distributed PCA top component (operators.Pca): one MomentMatrixAgg
    // scan (O(d²) shuffle bytes, no explode), round-6 sufficient stats,
    // then a deterministic 5-round driver power iteration the generated
    // oracle replays term-for-term — first 8 embedding dims
    "q_pca_top_component" -> { (s, d) =>
      graft.operators.Pca.topComponent(
        s, Tables(s, d).embeddings, "embedding", d = 8, iters = 5)
    },
    // top-two PCA via Hotelling deflation (Pca.topTwoComponents): second
    // power iteration on C − λ₁v₁v₁ᵀ, both replayed by the generated oracle
    "q_pca_two_components" -> { (s, d) =>
      graft.operators.Pca.topTwoComponents(
        s, Tables(s, d).embeddings, "embedding", d = 8, iters = 5)
    },
    // Pearson correlation matrix (operators.Correlation): upper triangle
    // over the first 8 embedding dims, from the SAME MomentMatrixAgg scan
    // as PCA — one aggregate, two consumers
    "q_correlation_matrix" -> { (s, d) =>
      graft.operators.Correlation.matrix(
        s, Tables(s, d).embeddings, "embedding", d = 8)
    },
    // Okapi BM25 retrieval (operators.Bm25): top-10 docs per query for a
    // fixed 4-query workload — query terms broadcast against the posting
    // lists, corpus tokenized once, never reshuffled for the join; one
    // OOV term ("zzzmissing") exercises the no-posting path
    "q_bm25_top_docs" -> { (s, d) =>
      import s.implicits._
      val queries = Bm25Queries.toDF("query_id", "term")
      graft.operators.Bm25.topDocs(Tables(s, d).documents, queries, topK = 10)
    },
    // hybrid lexical+dense retrieval fused by RRF (operators.
    // HybridRetrieval): query-by-example probes (doc_id < 5) — distinct
    // tokens as a more-like-this BM25 query (integer-micro term scores)
    // + embedding cosine kNN, top-20 lists fused by 1/(60+rank)
    "q_rrf_fusion" -> { (s, d) =>
      val t = Tables(s, d)
      graft.operators.HybridRetrieval.fuseByExample(t.documents, t.embeddings)
    },
    // tokenizer-vocab seeding: freq-ranked deterministic token ids over the
    // minCount-pruned vocabulary (operators.Vocab)
    "q_vocab" -> { (s, d) =>
      graft.operators.Vocab.build(Tables(s, d).documents, minCount = 2L)
    },
    // tokenizer application: every document encoded to its ordered
    // token-id sequence under the q_vocab vocabulary (OOV → -1), the
    // input a training shard / Packing consumes (operators.Vocab.encode)
    "q_encode" -> { (s, d) =>
      val docs = Tables(s, d).documents
      // the driver's oracle compare sorts rows through pandas, which cannot
      // hash array cells — ship the sequence as a space-joined string (the
      // operator itself still returns the typed Array[Long], spec-covered)
      graft.operators.Vocab.encode(docs,
        graft.operators.Vocab.build(docs, minCount = 2L))
        .select(col("doc_id"),
          array_join(col("token_ids").cast("array<string>"), " ").as("token_seq"),
          col("n_tokens"), col("n_unk"))
    },
    // per-source curation report — the rollup a corpus dashboard reads:
    // volume, language spread, exact-dup pressure, repetition level
    "q_source_rollup" -> { (s, d) =>
      // tokenize once per row (one projected toks column feeds both the
      // token total and the repetition metric — single tokenizer spelling)
      Tables(s, d).documents
        .select(col("source"), col("lang"), md5(col("text")).as("h"),
          TF.tokens(col("text")).as("toks"))
        .groupBy(col("source")).agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("lang")).as("n_langs"),
          sum(size(col("toks")).cast("long")).as("total_tokens"),
          (count(lit(1)) - countDistinct(col("h"))).as("dup_docs"),
          round(avg(Repetition.dupFrac(col("toks"))), 6).as("avg_dup_word_frac")
        )
    },
    "q_label_centroids" -> { (s, d) =>
      Similarity.labelCentroids(Tables(s, d).embeddings)
        .withColumn("centroid_val", round(col("centroid_val"), 6))
    },
    // ops analytics: hourly error-rate with z-score anomaly flag
    "q_error_anomalies" -> { (s, d) =>
      val hourly = Tables(s, d).events
        .groupBy(date_trunc("hour", col("ts")).cast("long").as("hour_s"))
        .agg(
          count(when(col("event_type") === "error", 1)).as("n_errors"),
          count(lit(1)).as("n_events")
        )
        .withColumn("error_rate", col("n_errors").cast("double") / col("n_events"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy()
      hourly
        .withColumn("mean_rate", avg(col("error_rate")).over(w))
        .withColumn("sd_rate", stddev_samp(col("error_rate")).over(w))
        .select(
          col("hour_s"), col("n_errors"), col("n_events"),
          round(col("error_rate"), 6).as("error_rate"),
          (col("error_rate") > col("mean_rate") + lit(2.0) * col("sd_rate")).as("is_anomaly")
        )
    },
    // full scale-path pipeline: leakage-free features → distributed SGD fit →
    // distributed scoring (no collect anywhere except the gradient vector)
    "q_sgd_intent_scores" -> { (s, d) =>
      // fit (epochs × scan) and the scoring pass share ONE materialization of
      // the sessionization lineage; without this the scoring select re-derives
      // the whole CSV-map → window → filter → aggregate chain from scratch.
      val features = sessionFeatures(s, d)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cols = IntentModel.FeatureCols.toSeq
      val model = graft.ml.DistributedSgd.fit(features, cols, epochs = 10, lr = 1.0)
      features.select(
        col("user_session"), col("label"),
        round(model.scoringColumn(cols.map(col)), 6).as("intent_score")
      )
    },
    // the hash-oracled twin of q_sgd_intent_scores: SgdReplay's integer-
    // micro full-batch trainer (min-max micro features, rational sigmoid,
    // e6-quantized gradients — every sum an exact BIGINT), so the trained
    // weights AND per-row scores replay bit-for-bit in DuckDB
    "q_sgd_det" -> { (s, d) =>
      val cols = IntentModel.FeatureCols.toSeq
      val q = graft.ml.SgdReplay
        .quantize(sessionFeatures(s, d), cols, Seq("user_session", "label"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val model = graft.ml.SgdReplay.fit(q, cols.size, epochs = 4)
      q.select(
        col("user_session"), col("label"),
        graft.ml.SgdReplay.scoreMicros(model, cols.size).as("score_micros"))
    },
    "q_hourly_profile" -> { (s, d) =>
      Tables(s, d).events
        .groupBy(col("event_type"), hour(col("ts")).as("hour_of_day"))
        .agg(count(lit(1)).as("n"), Money.moneySum(col("value")).as("total_value"))
    },
    "q_lang_id" -> { (s, d) =>
      TF.withLangId(
        Tables(s, d).documents.select(col("doc_id"), col("lang").as("lang_declared"), col("text")),
        "text", "lang_detected")
        .select(col("doc_id"), col("lang_declared"), col("lang_detected"))
    },
    "q_fingerprints" -> { (s, d) =>
      Tables(s, d).documents.select(col("doc_id"), TF.fingerprint(col("text")).as("fp"))
    },
    // portable twin of q_fingerprints: md5-derived token hash instead of
    // xxhash64, so the exact fingerprint values hash-match a DuckDB oracle
    // (the xxhash kernel above stays engine-hash ✘O, equivalence-spec'd)
    "q_fingerprints_md5" -> { (s, d) =>
      Tables(s, d).documents
        .select(col("doc_id"), TF.fingerprintPortable(col("text")).as("fp"))
    },
    // ---- generation-eval metrics (deterministic cand/ref doc pairs) ----
    // corpus BLEU-4 per source: clipped n-gram precision + brevity penalty
    "q_bleu_corpus" -> { (s, d) =>
      graft.operators.Bleu.corpusBleu(Tables(s, d).documents)
    },
    // ROUGE-1/2 per source: per-pair P/R/F1 in e6 micros, macro-averaged
    "q_rouge_corpus" -> { (s, d) =>
      graft.operators.Bleu.rougeCorpus(Tables(s, d).documents)
    },
    // Bradley–Terry MM fit over cross-source contests (5 integer-micro
    // rounds; the corpus-scale work is the one win-matrix aggregation)
    "q_bradley_terry" -> { (s, d) =>
      graft.operators.BradleyTerry.fit(s, Tables(s, d).documents)
    },
    // Fleiss' kappa per language across three deterministic raters
    "q_fleiss_kappa" -> { (s, d) =>
      graft.operators.Agreement.fleissKappa(Tables(s, d).documents)
    },
    // chrF2: character n-gram F-score (orders 1..6, beta = 2)
    "q_chrf_corpus" -> { (s, d) =>
      graft.operators.Bleu.chrF(Tables(s, d).documents)
    },
    // Krippendorff's alpha (nominal) — same raters, coincidence algebra
    "q_krippendorff_alpha" -> { (s, d) =>
      graft.operators.Agreement.krippendorffAlpha(Tables(s, d).documents)
    },
    // neighborhood link prediction (operators.LinkPrediction): common
    // neighbors / Adamic–Adar / resource-allocation over the same capped
    // co-interaction graph q_copurchase counts — per-user integer-micro
    // weights, BIGINT sums, one user-key shuffle + one pair aggregate
    // purchase interactions only: degrees land BELOW the cap (5..24 at
    // sf0.01) so the 1/ln(deg) weighting actually discriminates — the
    // all-events graph saturates every user at the cap
    "q_link_prediction" -> { (s, d) =>
      val inter = Tables(s, d).events
        .filter(col("event_type") === "purchase")
        .select(col("user_id"),
          from_json(col("props"), lit("k INT")).getField("k").cast("long").as("item_id"))
        .filter(col("item_id").isNotNull)
      graft.operators.LinkPrediction.itemScores(inter, "user_id", "item_id",
        capPerUser = 20, minCommon = 2L)
    },
    // multinomial Naive Bayes language id (operators.NaiveBayesText):
    // Laplace-smoothed train on doc_id%5!=0, argmax on the holdout —
    // every score a BIGINT sum of lnE6 integers, confusion matrix out
    "q_naive_bayes" -> { (s, d) =>
      graft.operators.NaiveBayesText.confusion(Tables(s, d).documents)
    },
    // pairwise Jensen–Shannon divergence between per-source unigram
    // distributions on the global top-200 support (operators.Divergence)
    "q_js_divergence" -> { (s, d) =>
      graft.operators.Divergence.jsdBySource(Tables(s, d).documents)
    },
    // vocabulary-richness estimators (operators.Richness): per-source
    // frequency spectrum → bias-corrected Chao1 + Good–Turing unseen
    // mass, ALL exact-BIGINT ratios (integer DIV, zero floats)
    "q_vocab_richness" -> { (s, d) =>
      graft.operators.Richness.bySource(Tables(s, d).documents)
    },
    // TextRank keywords: weighted PageRank (BIGINT-nanos state) over the
    // adjacent-token co-occurrence graph of the top-100 non-stop words
    "q_textrank_keywords" -> { (s, d) =>
      graft.operators.TextRank.keywords(Tables(s, d).documents)
    },
    // four-fifths selection-bias audit of a curation filter across
    // sources (operators.CurationBias): integer-micro rates and impact.
    // The audited decision is the min-length gate (>= 50 tokens) — the
    // full Gopher battery rejects ALL synthetic docs (zero-signal audit);
    // the length gate discriminates by source on this corpus
    "q_curation_bias" -> { (s, d) =>
      val docs = Tables(s, d).documents
      val flags = docs.select(col("doc_id"),
        (TF.tokenCount(col("text")) >= 50).as("keep"))
      graft.operators.CurationBias.selectionRates(docs, flags, "source")
    },
  )
}
