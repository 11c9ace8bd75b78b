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
private[graft] object QueriesVector {
  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- similarity search over embeddings ----
    "q_embedding_norms" -> { (s, d) =>
      Tables(s, d).embeddings.select(col("vec_id"), VF.norm2(col("embedding")).as("l2_norm"))
    },
    "q_knn_bruteforce" -> { (s, d) =>
      val emb = Tables(s, d).embeddings
      Similarity.bruteForceKnn(emb.filter(col("vec_id") < 5), emb, k = 10)
        .select(col("query_id"), col("neighbor_id"), round(col("cos"), 6).as("cos"), col("rank"))
    },
    // same cosine + row_number kernel as the ANN variants, deterministic
    // id-window candidate set — the oracle-able twin of lsh/ivf scoring
    "q_knn_subset" -> { (s, d) =>
      val emb = Tables(s, d).embeddings
      Similarity.windowedKnn(emb.filter(col("vec_id") < 5), emb, k = 10, window = 100)
        .select(col("query_id"), col("neighbor_id"), round(col("cos"), 6).as("cos"), col("rank"))
    },
    // Matryoshka truncation evaluation: recall@10 of prefix-dim cosine
    // retrieval (8/16/32 of 64 dims) vs full-dim, per probe — both sides
    // exact brute-force rankings with id tie-breaks, so the whole
    // evaluation is deterministic and hash-oracled (operators.Matryoshka)
    "q_matryoshka_recall" -> { (s, d) =>
      val emb = Tables(s, d).embeddings
      graft.operators.Matryoshka.prefixRecall(
        emb.filter(col("vec_id") < 8), emb, dims = Seq(8, 16, 32), k = 10)
    },
    // symmetric int8 scalar quantization (operators.Quantize): scale =
    // max|x|/127, codes = floor(x/scale + 0.5) clamped — zero-shuffle
    // projection, order-independent per element, engine-identical
    "q_quantize_int8" -> { (s, d) =>
      graft.operators.Quantize.withInt8(Tables(s, d).embeddings, "embedding")
        .select(col("vec_id"), round(col("q_scale"), 6).as("q_scale"),
          array_join(col("q_codes").cast("array<string>"), " ").as("code_seq"))
    },
    // the same deterministic-candidate kNN kernel, run over int8 codes:
    // integer dot products are exact in doubles, so the quantized cosine
    // (and its ranking) reproduces bit-for-bit cross-engine
    "q_knn_int8_subset" -> { (s, d) =>
      val emb = graft.operators.Quantize.withInt8(Tables(s, d).embeddings, "embedding")
        .select(col("vec_id"), col("q_codes"))
      Similarity.windowedKnn(emb.filter(col("vec_id") < 5), emb,
        k = 10, window = 100, vecCol = "q_codes")
        .select(col("query_id"), col("neighbor_id"), round(col("cos"), 6).as("cos"), col("rank"))
    },
    // HASH-ORACLED since r18 via the deterministic-replay spelling (the
    // q_cosine_neardup recipe): per-table seeded Gaussian planes as
    // integer-micro literals in BOTH engines, exact BIGINT bucket
    // signatures, XOR Hamming-1 probes, floor-6 cosine + rank replay
    // (KnnLshOracleSql). The float lshKnn stays the engine-RNG perf twin
    // (SimilaritySpec recall + det-parity pins).
    "q_knn_lsh" -> { (s, d) =>
      val emb = Tables(s, d).embeddings
      // 4 planes → 16 buckets/table fits the sf-scale corpus (500–5000
      // vectors); at real scale planes grow with log2(corpus/bucket_target).
      Similarity.lshKnnDet(emb.filter(col("vec_id") < 5), emb, k = 10, nPlanes = 4)
        .select(col("query_id"), col("neighbor_id"), col("cos6"), col("rank"))
    },
    "q_knn_ivf" -> { (s, d) =>
      val emb = Tables(s, d).embeddings
      // 8 lists / 4 probes suits the sf-scale corpus; at real scale nLists
      // grows with sqrt(corpus) and nProbe tunes the recall/cost curve.
      Similarity.ivfKnn(emb.filter(col("vec_id") < 5), emb, k = 10, nLists = 8, nProbe = 4)
        .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
    },
    // deterministic IVF twin (operators.IvfReplay): KMeansReplay coarse
    // quantizer → posting lists → probe selection → exact integer L2
    // top-k — the whole ANN index pipeline hash-oracled end to end
    // (IvfDetOracleSql replays the quantizer via the shared KMeansCtes);
    // q_knn_ivf above stays the MLlib-trained perf twin
    "q_knn_ivf_det" -> { (s, d) =>
      val emb = Tables(s, d).embeddings
      IvfReplay.knn(s, emb.filter(col("vec_id") < 5), emb,
        k = 10, nLists = 8, nProbe = 4, rounds = 3)
    },
    // the IVF retrieval QUALITY oracled (the q_matryoshka_recall pattern):
    // recall@10 of the probed lists vs the exact ranking over the same
    // quantized points — both rankings replayed, exact-integer recall
    "q_ivf_recall" -> { (s, d) =>
      val emb = Tables(s, d).embeddings
      IvfReplay.recallVsExact(s, emb.filter(col("vec_id") < 5), emb,
        k = 10, nLists = 8, nProbe = 4, rounds = 3)
    },
    // rank-biased overlap between the probed-IVF and exact rankings
    // (operators.Rbo, Webber 2010): the top-weighted agreement — where
    // recall@10 treats all positions equally, RBO geometrically weights
    // the head, so a tail-only miss barely moves it
    "q_rbo_ivf" -> { (s, d) =>
      val emb = Tables(s, d).embeddings
      val q = emb.filter(col("vec_id") < 5)
      graft.operators.Rbo.rboAtK(
        IvfReplay.knn(s, q, emb, k = 10, nLists = 8, nProbe = 4, rounds = 3),
        IvfReplay.exactKnn(s, q, emb, k = 10))
    },
    // product-quantization compression pass: every vector → m=4 one-byte
    // codes under the deterministic codebook (the corpus-scale persist step;
    // operators.ProductQuantization.encode). Codes ship as a space-joined
    // string — the driver compare cannot hash array cells.
    "q_pq_codes" -> { (s, d) =>
      val emb = Tables(s, d).embeddings
      val cb = graft.operators.ProductQuantization.fixedCodebooks(emb, m = 4, k = 8, dim = 64)
      graft.operators.ProductQuantization.encode(emb, cb)
        .select(col("vec_id"),
          array_join(col("codes").cast("array<string>"), " ").as("code_seq"))
    },
    // ADC top-k under the same deterministic codebook — oracles the
    // asymmetric-distance math engine-vs-engine (the windowedKnn pattern);
    // the trained path is q_knn_pq (RNG, recall-spec'd)
    "q_pq_subset" -> { (s, d) =>
      val emb = Tables(s, d).embeddings
      val cb = graft.operators.ProductQuantization.fixedCodebooks(emb, m = 4, k = 8, dim = 64)
      graft.operators.ProductQuantization.adcTopK(emb.filter(col("vec_id") < 5), emb, cb, k = 10)
        .select(col("query_id"), col("neighbor_id"), round(col("adist"), 6).as("adist"), col("rank"))
    },
    "q_knn_pq" -> { (s, d) =>
      val emb = Tables(s, d).embeddings
      // m=4 subspaces × 16 codes, 5 k-means passes: each extra subspace or
      // pass is another full KMeans job, and the exact rerank below carries
      // recall regardless of codebook polish (the IVF-quantizer economics);
      // PqSpec's recall bound runs the finer m=8 codebook
      val cb = graft.operators.ProductQuantization.train(emb, m = 4, k = 16, dim = 64,
        maxIter = 5)
      graft.operators.ProductQuantization.adcTopK(emb.filter(col("vec_id") < 5), emb, cb,
          k = 10, rerank = 50)
        .select(col("query_id"), col("neighbor_id"), round(col("sq_l2"), 6).as("sq_l2"), col("rank"))
    },
    // CCNet-style quality tiers: per-language exact terciles of the
    // bigram-LM score (rounded score + doc_id ordering is fully
    // deterministic, so the rank-based spelling is engine-reproducible;
    // operators.QualityBuckets.byApproxThresholds is the sort-free twin)
    "q_quality_buckets" -> { (s, d) =>
      val docs = Tables(s, d).documents
      val scored = LmScore.score(docs, docs)
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      graft.operators.QualityBuckets.byNtile(scored, n = 3)
        .select(col("doc_id"), col("lang"), col("avg_logp"), col("bucket"))
    },
    // skew-mitigation salted join: lineitem⋈orders with the key salted 8
    // ways — result rows are provably identical to the plain inner join, so
    // the oracle IS the plain join (operators.SkewJoin)
    "q_salted_join" -> { (s, d) =>
      val t = Tables(s, d)
      graft.operators.SkewJoin.saltedInner(
          t.lineitem.select(col("l_orderkey"), col("l_extendedprice"), col("l_discount")),
          t.orders.select(col("o_orderkey"), col("o_orderpriority")),
          "l_orderkey", "o_orderkey", salts = 8)
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_items"),
          Money.moneySum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
    },
    // exact-substring duplication (Lee et al. 2021, suffix-array dedup as
    // rolling 8-token window hashes): maximal cross-doc duplicated spans,
    // then the corpus with those spans cut out
    "q_substring_spans" -> { (s, d) =>
      graft.operators.SubstringDedup.duplicatedSpans(Tables(s, d).documents, w = 8)
    },
    "q_substring_clean" -> { (s, d) =>
      graft.operators.SubstringDedup.removeSpans(Tables(s, d).documents, w = 8)
    },
    // IVFADC — the FAISS-default composition: coarse lists + PQ on
    // residuals + ADC inside the nProbe probed lists + exact rerank.
    // Fully hash-oracled since r16: both k-means stages run the
    // deterministic sample trainer, so the WHOLE index (sample ranking,
    // coarse + residual Lloyd, posting, encode, probes, ADC, rerank)
    // replays in DuckDB — see IvfPqOracleSql
    "q_knn_ivfpq" -> { (s, d) =>
      val emb = Tables(s, d).embeddings
      graft.operators.ProductQuantization.ivfAdcKnn(emb.filter(col("vec_id") < 5), emb,
          k = 10, nLists = 8, nProbe = 4, m = 4, codes = 16, rerank = 50)
        .select(col("query_id"), col("neighbor_id"), round(col("sq_l2"), 6).as("sq_l2"), col("rank"))
    },
    // Random synthetic embeddings have no cosine>=0.5 pairs, so plant
    // deterministic near-duplicates (vec_id 1..3 copied under negated ids):
    // the run proves OUTPUT rows end-to-end (pairs (-i, i) at cos 1.0).
    // HASH-ORACLED since r17 via the deterministic-replay spelling: the
    // same seeded Gaussian planes as integer-micro literals
    // (cosineNearDupPairsDet), so the generated oracle replays the whole
    // bucket-join + exact cos >= 1/2 verification; the float-path
    // cosineNearDupPairs stays spec-covered (SimilaritySpec recall +
    // det-parity pins).
    "q_cosine_neardup" -> { (s, d) =>
      val emb = Tables(s, d).embeddings.select(col("vec_id"), col("embedding"))
      val planted = emb.filter(col("vec_id").between(1, 3))
        .select((-col("vec_id")).as("vec_id"), col("embedding"))
      Similarity.cosineNearDupPairsDet(emb.unionByName(planted))
    },
    // per-source population stability index over doc-length buckets —
    // the classic distribution-shift monitor (operators.Psi): Laplace-
    // smoothed, every term exact-integer with one e6-quantized ln
    "q_psi_by_source" -> { (s, d) =>
      val docs = Tables(s, d).documents
        .withColumn("b", expr("least(n_chars DIV 64, 9)").cast("int"))
      graft.operators.Psi.byGroup(docs, "b", "source", 10)
        .withColumnRenamed("group_key", "source")
    },
    // Mann-Kendall + Theil-Sen over the daily event-count series — the
    // nonparametric twin of q_trend_slopes' OLS (operators.RobustTrend);
    // days from the micros-truncated event time (the DuckDB NANOS gotcha)
    "q_robust_trend" -> { (s, d) =>
      val daily = Tables(s, d).events
        .select(expr("(ts_ns DIV 1000) DIV 86400000000").as("day"))
        .groupBy(col("day")).agg(count(lit(1)).as("y"))
      graft.operators.RobustTrend.mannKendallTheilSen(daily, "day", "y")
    },
    // exact two-sample KS over md5 arms on the event value distribution
    // (operators.KsTest): D as a pure integer max via PrefixSum cumulative
    // counts — the continuous drift test next to PSI's bucketed one
    "q_ks_arms" -> { (s, d) =>
      val e = Tables(s, d).events
        .where(col("value").isNotNull)
        .select(expr("CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)").as("x"),
          (graft.operators.HashSplit.md548(col("user_id")) % 2).as("arm"))
      graft.operators.KsTest.twoSample(e, "x", "arm")
    },
    // Pearson chi-square + Cramér's V over the source × lang contingency
    // (operators.ChiSquare): is the language mix independent of source?
    "q_chi2_lang_source" -> { (s, d) =>
      graft.operators.ChiSquare.contingency(Tables(s, d).documents, "source", "lang")
    },
    // Benjamini-Hochberg FDR over per-source Welch z-tests (mean doc
    // length vs rest): exact BIGINT moments, Zelen-Severo normal tail
    // spelled identically cross-engine, integer step-up decisions at
    // alpha = 0.05 (operators.MultipleTesting)
    "q_fdr_bh" -> { (s, d) =>
      graft.operators.MultipleTesting.bhBySource(
        Tables(s, d).documents, "source", "n_chars", alphaE6 = 50000L)
        .withColumnRenamed("group_key", "source")
    },
    // split conformal prediction for document length: md5-split
    // train/cal/test, per-source integer-micros mean model, exact
    // ceil((n+1)(1-alpha)) calibration quantile, per-source test coverage
    // (operators.Conformal; alpha = 0.1)
    "q_conformal_coverage" -> { (s, d) =>
      graft.operators.Conformal.splitConformal(
        Tables(s, d).documents, "doc_id", "n_chars", "source")
        .withColumnRenamed("group_key", "source")
    },
    // k-anonymity generalization ladder over customer quasi-identifiers
    // (segment, nation, acctbal k$-band) — ONE rollup shuffle computes every
    // level's equivalence classes; per-level min-k + suppression profile at
    // the k >= 5 release bar (operators.Privacy)
    "q_k_anonymity" -> { (s, d) =>
      graft.operators.Privacy.kAnonymityLadder(
        privacyQi(s, d), Seq("seg", "nat", "band"), kThreshold = 5L)
    },
    // distinct-l-diversity histogram for the same release: distinct
    // sensitive balance-bands per (segment, nation) class — the
    // homogeneity-attack surface next to q_k_anonymity's re-identification one
    "q_l_diversity" -> { (s, d) =>
      graft.operators.Privacy.lDiversityHistogram(
        privacyQi(s, d), Seq("seg", "nat"), col("band"))
    },
    // t-closeness EMD audit over the same release: per (segment) class,
    // ordered-EMD of the balance-band distribution vs the global one —
    // integer cumsum differences, one exact division per class
    "q_t_closeness" -> { (s, d) =>
      graft.operators.Privacy.tCloseness(
        privacyQi(s, d), Seq("seg"), col("band"))
    },
    // eps=1 differentially-private histogram release of the event-type
    // counts: Laplace(1/eps) noise inverse-CDF'd from the portable md5-48
    // uniform of "salt:key" — the whole release replays in the oracle
    "q_dp_histogram" -> { (s, d) =>
      graft.operators.Privacy.dpHistogram(
        Tables(s, d).events, "event_type", eps = 1.0, salt = "dp-r17")
    },
    // Count-Min sketch audit: exact top-20 users with their CMS point
    // estimates (operators.CountMin, md5-48 hash family, d=4 w=64) — the
    // upper-biased point-query sibling of the Misra-Gries lower bounds;
    // ge_ok is the structural est >= exact guarantee, oracled TRUE
    "q_cms_counts" -> { (s, d) =>
      graft.operators.CountMin.audit(Tables(s, d).events, "user_id", d = 4, w = 64, k = 20)
        .withColumnRenamed("item", "user_id")
    },
    // sketch-bracket CONTRACT (the q_hll_rollup_checked pattern, closing
    // the MG/CMS pair into a self-checking system): per exact-top-20 user,
    // Misra-Gries lower bound <= exact <= CMS estimate, plus the MG slack
    // guarantee exact - mg_lb <= n/(k+1). The MG bound itself is
    // order-dependent (lower-bound semantics), so the hashed columns are
    // the BOOLEANS — structurally TRUE in the oracle; a broken sketch
    // flips the hash
    "q_sketch_bracket" -> { (s, d) =>
      val ev = Tables(s, d).events
      val kMg = 64
      val mgLb = coalesce(try_element_at(col("mgm"), col("item")), lit(0L))
      val mg = ev.agg(
        graft.expressions.FreqSketch
          .freq_sketch(col("user_id").cast("string"), kMg).as("mgm"),
        count(when(col("user_id").isNotNull, 1)).as("n_total"))
      graft.operators.CountMin.audit(ev, "user_id", d = 4, w = 64, k = 20)
        .crossJoin(broadcast(mg))
        .select(col("item").as("user_id"), col("exact_n"), col("est_n"),
          (col("est_n") - col("exact_n")).as("overcount"),
          (mgLb <= col("exact_n")).as("lower_ok"),
          ((col("exact_n") - mgLb) * (kMg + 1) <= col("n_total")).as("slack_ok"),
          (mgLb <= col("exact_n") && col("exact_n") <= col("est_n")).as("bracket_ok"))
    },
    // stratified causal-effect battery over a CONFOUNDED exposure (added-
    // to-cart → purchase, confounded by view activity): naive risk diff vs
    // direct-standardization ATE (≡ saturated-propensity IPW) vs ATT, with
    // positivity-violating strata contributing zero by stated contract
    // (operators.Causal; strata = view_count capped at 8)
    "q_stratified_ate" -> { (s, d) =>
      val f = sessionFeatures(s, d).select(
        when(col("cart_count") >= 1, lit(1L)).otherwise(lit(0L)).as("t"),
        col("label").cast("long").as("y"),
        least(col("view_count"), lit(8)).as("stratum"))
      graft.operators.Causal.stratifiedEffects(f, "t", "y", "stratum")
    },
    // the uncertainty row q_stratified_ate ships without: percentile
    // bootstrap CI for the SAME stratified ATE, Poisson replicate weights
    // from md5-48(user_session:b) — the Bootstrap machinery composed
    // through Causal's exact per-stratum algebra, fully replayable
    "q_ate_bootstrap" -> { (s, d) =>
      val f = sessionFeatures(s, d).select(
        col("user_session"),
        when(col("cart_count") >= 1, lit(1L)).otherwise(lit(0L)).as("t"),
        col("label").cast("long").as("y"),
        least(col("view_count"), lit(8)).as("stratum"))
      graft.operators.Causal.stratifiedAteBootstrap(
        f, "t", "y", "stratum", "user_session", b = 100)
    },
    // Kaplan–Meier product-limit survival + Nelson–Aalen cumulative hazard
    // for time-to-first-purchase (hour buckets; users without a purchase
    // censored at their last event) — ln-space survival with per-term e6
    // quantization, exact-BIGINT risk sets, terminal S=0 row NULL by the
    // same CASE on both engines (operators.Survival)
    "q_survival_km" -> { (s, d) =>
      graft.operators.Survival.kaplanMeier(
        graft.operators.Survival.timeToEvent(
          Tables(s, d).events, "user_id", "event_type", "purchase"),
        "duration_h", "observed")
    },
    // log-rank (Mantel-Haenszel) test between md5 arms over the SAME
    // censored time-to-purchase durations as q_survival_km — the
    // time-to-event A/B test: per-event-time 2x2 tables, e6-quantized
    // E/V terms over exact-BIGINT risk sets, z through the shared
    // Zelen-Severo tail (operators.Survival.logRank)
    "q_logrank_arms" -> { (s, d) =>
      val dur = graft.operators.Survival.timeToEvent(
        Tables(s, d).events, "user_id", "event_type", "purchase")
        .withColumn("arm", graft.operators.HashSplit.md548(col("u")) % 2)
      graft.operators.Survival.logRank(dur, "duration_h", "observed", "arm")
    },
    // stratified (Mantel-Haenszel-pooled) log-rank: same arms, risk sets
    // and E/V terms computed WITHIN per-user activity tiers (event-count
    // DIV 20 capped at 3) and summed before the single z — the test to
    // reach for when arms are imbalanced across a hazard-shifting
    // covariate (operators.Survival.logRankStratified)
    "q_logrank_strat" -> { (s, d) =>
      val ev = Tables(s, d).events
      val dur = graft.operators.Survival.timeToEvent(
        ev, "user_id", "event_type", "purchase")
        .withColumn("arm", graft.operators.HashSplit.md548(col("u")) % 2)
      val tiers = ev.groupBy(col("user_id").as("u"))
        .agg(count(lit(1)).as("n_ev"))
        .select(col("u"), expr("least(n_ev DIV 20, 3)").as("tier"))
      graft.operators.Survival.logRankStratified(
        dur.join(tiers, Seq("u")), "duration_h", "observed", "arm", "tier")
    },
    // eps-DP mean release with explicit accounting: n_chars clamped to
    // [0, 2000], Laplace(R/eps_s) on the shifted sum + Laplace(1/eps_c)
    // on the count (md5-replayable draws), quotient clamped back as pure
    // post-processing, eps_total = eps_s + eps_c by sequential
    // composition (operators.Privacy.dpMean)
    "q_dp_mean" -> { (s, d) =>
      graft.operators.Privacy.dpMean(Tables(s, d).documents, "n_chars",
        lo = 0L, hi = 2000L, epsSum = 0.5, epsCount = 0.5, salt = "dp-r15")
    },
    // deterministic HyperLogLog twin of q_hll_rollup: md5-48 registers
    // (p=6, m=64), EXACT dyadic harmonic sum in BIGINT, linear-counting
    // small-range branch, plus a max-merged ALL row proving sketch
    // mergeability — the whole estimate replays in the oracle
    // (operators.HllReplay; distinct user-days per event type)
    "q_hll_md5" -> { (s, d) =>
      val ev = Tables(s, d).events.select(col("event_type"),
        concat(col("user_id").cast("string"), lit("_"),
          date_format(col("ts"), "yyyy-MM-dd")).as("sess"))
      graft.operators.HllReplay.sketch(ev, "sess", "event_type")
        .withColumnRenamed("group_key", "event_type")
    },
    // incremental state-merge statistics (operators.IncrementalAgg): the
    // corpus splits at day parity into "yesterday's state" and "today's
    // delta"; each half aggregates separately and only the STATES merge
    // (count/sum add, min/max lattice-join, HLL register MAX). The oracle
    // computes the same statistics DIRECTLY over the full table — hash
    // equality IS the merge ≡ recompute identity, distinct estimate
    // included. The 100 TB refresh never rescans yesterday.
    "q_incremental_stats" -> { (s, d) =>
      val e = Tables(s, d).events
        .where(col("value").isNotNull)
        .select(col("event_type"),
          expr("CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)").as("v"),
          col("user_id"),
          expr("(ts_ns DIV 1000) DIV 86400000000").as("day"))
      graft.operators.IncrementalAgg.mergedStats(
          e.filter(pmod(col("day"), lit(2)) === 0),
          e.filter(pmod(col("day"), lit(2)) === 1),
          "event_type", "v", "user_id")
        .withColumnRenamed("group_key", "event_type")
    },
    // mergeable bottom-k quantile sketch (operators.QuantileSketch):
    // deciles of the event value from a 256-row md5-coordinated sample per
    // event type, plus the exact rank-error audit — the deterministic,
    // hash-oracled stand-in for KLL/t-digest in the sketch family
    "q_quantile_sketch" -> { (s, d) =>
      val e = Tables(s, d).events
        .select(col("event_type"),
          expr("CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)").as("v"),
          col("event_id"))
      graft.operators.QuantileSketch.sketchWithAudit(
          e, "event_type", "v", "event_id")
        .withColumnRenamed("group_key", "event_type")
    },
    // audience overlap between event types from coordinated bottom-k
    // samples (operators.SetOverlap): Jaccard / union / intersection
    // estimates — the set operations HLL cannot answer — plus the exact
    // audit. Deterministic md5 draws ⇒ the ESTIMATES hash-oracle.
    "q_user_overlap" -> { (s, d) =>
      graft.operators.SetOverlap.pairOverlaps(
        Tables(s, d).events, "event_type", "user_id")
    },
    // self-join size (second frequency moment) of lineitem on l_partkey
    // estimated WITHOUT the join, from a coordinated bottom-k key sample
    // (operators.JoinSizeEst, Vengerov 2015) — the planner question
    // "will this join explode?" answered from per-side one-pass sketches;
    // exact audit column = the true Σ a_i·b_i
    "q_join_size_est" -> { (s, d) =>
      val li = Tables(s, d).lineitem
      graft.operators.JoinSizeEst.estimate(li, "l_partkey", li, "l_partkey")
    },
    // Wilson score interval for the per-arm conversion rate — the
    // closed-form companion to q_bootstrap_uplift (operators.Binomial)
    "q_conversion_wilson" -> { (s, d) =>
      val f = sessionFeatures(s, d).select(
        (graft.operators.HashSplit.md548(col("user_session")) % 2).as("arm"),
        col("label"))
      graft.operators.Binomial.wilson(f, "label", "arm")
        .withColumnRenamed("group_key", "arm")
    },
    // Poisson bootstrap CI for the mean document length: the distributed
    // bootstrap (per-row Poisson(1) weights, no global resampling), fully
    // md5-replayable — see operators.Bootstrap
    "q_bootstrap_ci" -> { (s, d) =>
      graft.operators.Bootstrap.poissonMeanCi(
        Tables(s, d).documents, "n_chars", "doc_id", b = 200)
    },
    // the per-source variant: one CI row per domain (B = 100 — the
    // replicate explode multiplies the corpus scan, the uplift economics)
    "q_bootstrap_by_source" -> { (s, d) =>
      graft.operators.Bootstrap.poissonMeanCiByGroup(
        Tables(s, d).documents, "n_chars", "source", "doc_id", b = 100)
        .withColumnRenamed("group_key", "source")
    },
    // deterministic twin of q_cosine_neardup: md5-Rademacher Charikar
    // signs over integer micros, exact-integer cos >= 1/2 verification —
    // the same planted dups, now with a full hash oracle (the seeded
    // Gaussian path above stays the engine-RNG perf twin)
    "q_simhash_embed_neardup" -> { (s, d) =>
      val emb = Tables(s, d).embeddings.select(col("vec_id"), col("embedding"))
      val planted = emb.filter(col("vec_id").between(1, 3))
        .select((-col("vec_id")).as("vec_id"), col("embedding"))
      Similarity.simhashNearDupPairs(emb.unionByName(planted))
    },
    // embedding-space decontamination — the PARAPHRASE gap in the lexical
    // battery (operators.Decontaminate is shingle/Bloom/PPR-based; a
    // reworded benchmark item shares no shingles with its source but
    // stays adjacent in embedding space). Benchmark set = every 97th
    // corpus vector paraphrased (+0.0002/dim in the double domain keeps
    // cosine ≈ 1 with ZERO shingle overlap), keyed -vec_id-1; the
    // q_simhash_embed_neardup recipe (md5-Rademacher buckets, hot-bucket
    // cap, exact cos ≥ ½) pairs it against the corpus; a cross-side pair
    // IS contamination. Output: per flagged corpus doc, hit count + max
    // floor-6 cosine.
    "q_semantic_decontaminate" -> { (s, d) =>
      semanticDecontPairs(s, d)
        .groupBy(col("corpus_id"))
        .agg(count(lit(1)).as("n_bench_hits"), max(col("cos6")).as("cos6_max"))
        .join(Tables(s, d).embeddings
          .select(col("vec_id").as("corpus_id"), col("label")), Seq("corpus_id"))
        .select(col("corpus_id"), col("label"),
          col("n_bench_hits"), col("cos6_max"))
    },
    // corpus-level rollout of the same flags: per-label contaminated
    // fraction in exact ppm — the release-gate number a curation run
    // publishes next to the lexical q_contamination_fraction
    "q_semantic_decont_fraction" -> { (s, d) =>
      val corpus = Tables(s, d).embeddings
        .filter(col("embedding").isNotNull && size(col("embedding")) >= 64)
        .select(col("vec_id"), col("label"))
      val flagged = semanticDecontPairs(s, d).select(col("corpus_id")).distinct()
      corpus.join(flagged, corpus("vec_id") === flagged("corpus_id"), "left")
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_corpus"),
          sum(when(col("corpus_id").isNotNull, 1L).otherwise(0L)).as("n_flagged"))
        .select(col("label"), col("n_corpus"), col("n_flagged"),
          expr("n_flagged * 1000000 DIV n_corpus").as("frac_e6"))
    },
    // greedy facility-location coreset selection (operators.FacilitySelect):
    // 8 unrolled submodular-greedy rounds over the FIXED vec_id%16<2048
    // candidate pool (bounded however large the corpus — the pair stream
    // stays linear) — floor-6 cosines then ALL-integer gains/coverage,
    // argmax ties to the smaller candidate id
    "q_facility_select" -> { (s, d) =>
      graft.operators.FacilitySelect.greedy(s, Tables(s, d).embeddings,
        k = 8, candEvery = 16, candMax = 2048L)
    },
  )

  /** Cross-side (benchmark → corpus) SimHash-verified cosine pairs for the
    * semantic-decontamination pair: corpus ∪ paraphrased benchmark through
    * Similarity.simhashNearDupPairs; bench ids are negative, so a cross
    * pair is always (id1 = bench, id2 = corpus) under the id1 < id2 output
    * order. Non-negative vec_id makes `%` engine-safe.
    */
  private def semanticDecontPairs(s: SparkSession, d: String): DataFrame = {
    val emb = Tables(s, d).embeddings
    val corpus = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("embedding"))
    val bench = emb.filter(col("vec_id") % 97 === 0)
      .select((-col("vec_id") - 1L).as("vec_id"),
        transform(col("embedding").cast("array<double>"),
          x => x + lit(0.0002d)).as("embedding"))
    Similarity.simhashNearDupPairs(corpus.unionByName(bench))
      .filter(col("id1") < 0L && col("id2") >= 0L)
      .select(col("id2").as("corpus_id"), col("id1").as("bench_id"), col("cos6"))
  }
}
