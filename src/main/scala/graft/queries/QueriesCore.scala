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
private[graft] object QueriesCore {
  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- reference parity: sessionization + features (W1/J1/P4/A1) ----
    "q_session_features" -> ((s, d) => sessionFeatures(s, d)),
    "q_session_features_join" -> { (s, d) =>
      val cs = clickstream(s, d)
      val joined = Sessionize.withFirstPurchaseViaJoin(
        cs, ClickConf.sessionCol, ClickConf.typeCol, ClickConf.tsCol, ClickConf.purchaseType)
      Featurize.sessionFeatures(Sessionize.dropLeakage(joined, ClickConf.tsCol), ClickConf)
        .withColumn("avg_price", round(col("avg_price"), 6))
    },
    "q_first_purchase" -> { (s, d) =>
      clickstream(s, d)
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_session"))
        .agg(min(col("event_time")).cast("long").as("first_purchase_s"))
    },
    // ---- projections / filters / simple aggregates (P5/P11, A2-A8) ----
    "q_event_type_dist" -> { (s, d) =>
      Tables(s, d).events.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n")).orderBy(col("n").desc)
    },
    "q_null_counts" -> { (s, d) =>
      val ev = Tables(s, d).events
      ev.select(
        count(when(col("event_type").isNull, 1)).as("event_type_nulls"),
        count(when(col("value").isNull, 1)).as("value_nulls"),
        count(when(col("props").isNull, 1)).as("props_nulls"),
        count(when(col("user_id").isNull, 1)).as("user_id_nulls")
      )
    },
    "q_purchase_users_distinct" -> { (s, d) =>
      Tables(s, d).events.filter(col("event_type") === "purchase")
        .select(countDistinct(col("user_id")).as("n_purchase_users"))
    },
    "q_label_dist" -> { (s, d) =>
      sessionFeatures(s, d).groupBy(col("label")).agg(count(lit(1)).as("n"))
    },
    "q_value_describe" -> { (s, d) =>
      Tables(s, d).events.groupBy(col("event_type")).agg(
        count(col("value")).as("cnt"),
        round(avg(col("value")), 6).as("mean"),
        round(stddev_samp(col("value")), 6).as("std"),
        min(col("value")).as("min_v"),
        max(col("value")).as("max_v")
      )
    },
    "q_conversion_totals" -> ((s, d) => Featurize.batchTotals(clickstream(s, d), ClickConf)),
    // ---- §2.11 serving-plane reads (reference dashboard/app.py) ----
    // Each replays event-time hour batches through the REAL MetricsStore
    // JSON file (streaming.MetricsReplay), then runs the dashboard query
    // over the store — the full write→serve round trip is what's oracled.
    // conversion-rate time series, most recent 50 batches (app.py:227-238)
    "q_metrics_series" -> { (s, d) =>
      val p = graft.streaming.MetricsReplay.ensureStore(Tables(s, d).events, d)
      graft.streaming.MetricsStore.conversionSeries(s, p, 50)
    },
    // event-distribution totals over the last 10 batches (app.py:243-266)
    "q_metrics_eventdist" -> { (s, d) =>
      val p = graft.streaming.MetricsReplay.ensureStore(Tables(s, d).events, d)
      graft.streaming.MetricsReplay.eventDistribution(s, p, 10)
    },
    // intent-bucketed prediction table over the newest batch's scored
    // sessions (app.py:311-354; purchased ▸ high ▸ medium ▸ browsing)
    "q_metrics_predictions" -> { (s, d) =>
      val p = graft.streaming.MetricsReplay.ensureStore(Tables(s, d).events, d)
      graft.streaming.MetricsStore.predictionTable(s, p, 20)
    },
    "q_heuristic_scores" -> { (s, d) =>
      val f = sessionFeatures(s, d)
      val score = Heuristic.score(col("cart_count"), col("view_count"))
      f.select(
        col("user_session"), col("cart_count"), col("view_count"),
        score.as("intent_score"),
        Heuristic.intentBucket(score).as("intent_bucket")
      )
    },
    // ---- deterministic evaluation battery over the heuristic ladder ----
    // integer-micro scores only: no double literal ever crosses an engine
    // boundary (operators.ClassifierEval)
    "q_classifier_prf" -> { (s, d) =>
      val f = sessionFeatures(s, d).select(
        Heuristic.scoreMicros(col("cart_count"), col("view_count")).as("score_micros"),
        col("label"))
      graft.operators.ClassifierEval.prfSweep(f, "score_micros", "label",
        Seq(50000L, 200000L, 350000L, 600000L, 850000L))
    },
    // isotonic (PAV) calibration of the heuristic tiers via the minimax
    // closed form — monotone calibrated rates, the other classic
    // calibrator next to q_calibration's ECE (operators.Isotonic)
    "q_isotonic_calibration" -> { (s, d) =>
      val f = sessionFeatures(s, d).select(
        Heuristic.scoreMicros(col("cart_count"), col("view_count")).as("score_micros"),
        col("label"))
      graft.operators.Isotonic.calibrate(f, "score_micros", "label")
    },
    // chance-corrected agreement of the heuristic's cart tier vs the
    // label: Cohen's kappa + MCC from exact contingency integers, one
    // replayed division each (operators.ClassifierEval.agreement)
    "q_agreement_kappa" -> { (s, d) =>
      val f = sessionFeatures(s, d).select(
        Heuristic.scoreMicros(col("cart_count"), col("view_count")).as("score_micros"),
        col("label"))
      graft.operators.ClassifierEval.agreement(f, "score_micros", "label", 600000L)
    },
    // A/A uplift interval: conversion-rate difference between md5-split
    // arms with a Poisson-bootstrap CI — the experiment primitive; the
    // hash split carries no signal, so the interval must bracket 0
    // (spec-pinned) and the whole distribution replays
    // B = 100 (not the mean-CI's 200): the uplift query pays B× the md5
    // work ON TOP of sessionization — 100 replicates keeps a proper
    // 2.5/97.5 percentile interval at half the scan cost
    "q_bootstrap_uplift" -> { (s, d) =>
      val f = sessionFeatures(s, d).select(col("user_session"),
        (graft.operators.HashSplit.md548(col("user_session")) % 2).as("arm"),
        col("label").cast("long").as("v"))
      graft.operators.Bootstrap.poissonDiffCi(f, "v", "arm", "user_session", b = 100)
    },
    "q_calibration" -> { (s, d) =>
      val f = sessionFeatures(s, d).select(
        Heuristic.scoreMicros(col("cart_count"), col("view_count")).as("score_micros"),
        col("label"))
      graft.operators.ClassifierEval.calibration(f, "score_micros", "label")
    },
    "q_gains_by_decile" -> { (s, d) =>
      val f = sessionFeatures(s, d).select(col("user_session"),
        Heuristic.scoreMicros(col("cart_count"), col("view_count")).as("score_micros"),
        col("label"))
      graft.operators.ClassifierEval.gainsByDecile(f, "score_micros", "label", "user_session")
    },
    "q_auc_exact" -> { (s, d) =>
      val f = sessionFeatures(s, d).select(
        Heuristic.scoreMicros(col("cart_count"), col("view_count")).as("score_micros"),
        col("label"))
      graft.operators.ClassifierEval.aucExact(f, "score_micros", "label")
    },
    // ---- windows: tumbling (oracle) + sliding (reference T2 shape) ----
    "q_tumbling_activity" -> { (s, d) =>
      SessionWindows.tumblingActivity(Tables(s, d).events, valueAgg = Money.moneySum)
        .withColumn("hour_start", col("hour_start").cast("long"))
        .withColumnRenamed("hour_start", "hour_start_s")
    },
    "q_sliding_windows" -> { (s, d) =>
      SessionWindows.slidingSessionAgg(
        clickstreamPar(s, d),
        sessionCol = "user_session", tsCol = "event_time", typeCol = "event_type",
        priceCol = "price", itemCol = "product_id",
        cartType = "click", exactDistinct = true
      ).select(
        col("user_session"),
        col("window.start").cast("long").as("window_start_s"),
        col("view_count"), col("cart_count"), col("purchase_count"),
        col("total_events"), col("session_duration"),
        round(col("avg_price"), 6).as("avg_price"),
        col("max_price"), col("unique_items")
      )
    },
    // The plan you'd actually run at 100x: HLL approx_count_distinct for
    // unique_items instead of countDistinct's Expand over the x10 sliding
    // row multiplication (exact distinct is also unsupported in real
    // streaming aggregation). No oracle — the HLL estimate is
    // engine-specific; StreamingSpec bounds it against the exact twin.
    "q_sliding_windows_approx" -> { (s, d) =>
      SessionWindows.slidingSessionAgg(
        clickstreamPar(s, d),
        sessionCol = "user_session", tsCol = "event_time", typeCol = "event_type",
        priceCol = "price", itemCol = "product_id",
        cartType = "click", exactDistinct = false
      ).select(
        col("user_session"),
        col("window.start").cast("long").as("window_start_s"),
        col("view_count"), col("cart_count"), col("purchase_count"),
        col("total_events"), col("session_duration"),
        round(col("avg_price"), 6).as("avg_price"),
        col("max_price"), col("unique_items")
      )
    },
    // exact-twin CHECK for the approx sliding windows (the
    // q_semdedup_subset pattern): join the exact and HLL spellings on the
    // window key and pin |approx − exact| ≤ max(1, 5%·exact) as a boolean
    // the oracle states as TRUE — per-window cardinalities are tiny, where
    // HLL++ is exact-or-nearly, so the bound is structural, not luck.
    "q_sliding_approx_checked" -> { (s, d) =>
      def half(exact: Boolean) = SessionWindows.slidingSessionAgg(
        clickstreamPar(s, d),
        sessionCol = "user_session", tsCol = "event_time", typeCol = "event_type",
        priceCol = "price", itemCol = "product_id",
        cartType = "click", exactDistinct = exact
      ).select(
        col("user_session"),
        col("window.start").cast("long").as("window_start_s"),
        col("unique_items"))
      half(exact = true)
        .join(half(exact = false).withColumnRenamed("unique_items", "approx_items"),
          Seq("user_session", "window_start_s"))
        .select(col("user_session"), col("window_start_s"), col("unique_items"),
          (abs(col("approx_items") - col("unique_items")) <=
            greatest(lit(1.0), col("unique_items") * lit(0.05)))
            .as("approx_within_5pct"))
    },
    // P9: real from_json struct extraction (vs the regexp spelling used by
    // the clickstream mapping)
    "q_json_extract" -> { (s, d) =>
      Tables(s, d).events
        .select(col("event_id"),
          from_json(col("props"), lit("k INT")).getField("k").as("k"))
    },
    // the Spark 4 VARIANT path for the same extraction: parse_json →
    // variant_get — the open semi-structured type (shredded binary, no
    // up-front schema) next to the schema-on-read from_json twin above
    "q_variant_extract" -> { (s, d) =>
      Tables(s, d).events
        .select(col("event_id"),
          variant_get(parse_json(col("props")), "$.k", "int").as("k"))
    },
    // A1g HLL twin: approx_count_distinct vs exact, per event type
    "q_approx_distinct" -> { (s, d) =>
      Tables(s, d).events.groupBy(col("event_type")).agg(
        countDistinct(col("user_id")).as("exact_users"),
        approx_count_distinct(col("user_id")).as("approx_users")
      )
    },
    // the exact half of q_approx_distinct, split out so it can hash-match a
    // SQL oracle (the HLL column is engine-specific, ±5%-spec'd instead)
    "q_exact_distinct" -> { (s, d) =>
      Tables(s, d).events.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_users"))
    },
    // incremental distinct: per-(type, hour) HLL sketches unioned up to
    // per-type — the sketch-once/rollup-many pattern (operators.SketchRollup).
    // DataSketches estimate is engine-specific -> rows-only; the spec pins
    // rollup within 2% of the direct sketch and ±5% of exact
    "q_hll_rollup" -> { (s, d) =>
      val ev = Tables(s, d).events
        .select(col("event_type"), hour(col("ts")).as("h"), col("user_id"))
      val fine = graft.operators.SketchRollup.sketchBy(
        ev, Seq("event_type", "h"), "user_id")
      graft.operators.SketchRollup.rollupEstimate(fine, Seq("event_type"))
    },
    // exact-twin CHECK for the HLL rollup (the q_semdedup_subset pattern):
    // DuckDB can't replay the DataSketches estimate, but it CAN assert the
    // CONTRACT — per-type exact distinct counts plus a boolean pinning the
    // rolled-up estimate within ±5% of exact (TRUE on every row in the
    // oracle). If the sketch-once/union-up path ever drifts past the bound,
    // the Spark boolean flips and the driver hash mismatches.
    "q_hll_rollup_checked" -> { (s, d) =>
      val ev = Tables(s, d).events
        .select(col("event_type"), hour(col("ts")).as("h"), col("user_id"))
      val fine = graft.operators.SketchRollup.sketchBy(
        ev, Seq("event_type", "h"), "user_id")
      val rolled = graft.operators.SketchRollup.rollupEstimate(fine, Seq("event_type"))
      ev.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_users"))
        .join(rolled, Seq("event_type"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("approx_distinct") - col("exact_users")) <=
            col("exact_users") * lit(0.05)).as("rollup_within_5pct"))
    },
    // approx-quantile CONTRACT check (the q_hll_rollup_checked pattern):
    // approx_percentile guarantees rank error <= n/accuracy; we recompute
    // the returned value's exact rank bracket [rank_lt+1, rank_le] and
    // assert it intersects the target rank +/- the bound (2x slack for
    // partition-merge degradation) — a drifting sketch flips the hash
    "q_approx_quantiles_checked" -> { (s, d) =>
      val acc = 1000
      val ev = Tables(s, d).events.select(col("event_type"), col("value"))
      val apx = ev.groupBy(col("event_type")).agg(
        expr(s"approx_percentile(value, array(0.5, 0.9), $acc)").as("ap"),
        count(lit(1)).as("n"))
      val targets = apx.select(col("event_type"), col("n"),
        posexplode(col("ap")).as(Seq("i", "r")))
        .withColumn("q_micros",
          when(col("i") === 0, lit(500000L)).otherwise(lit(900000L)))
      val eps = col("n").cast("double") * 2d / acc + 1d
      val t = col("q_micros").cast("double") / 1e6 * col("n").cast("double")
      ev.join(broadcast(targets), Seq("event_type"))
        .groupBy(col("event_type"), col("q_micros"), col("n"))
        .agg(
          sum(when(col("value") <= col("r"), 1L).otherwise(0L)).as("rank_le"),
          sum(when(col("value") < col("r"), 1L).otherwise(0L)).as("rank_lt"))
        .select(col("event_type"), col("q_micros"), col("n"),
          (col("rank_lt").cast("double") <= t + eps &&
            col("rank_le").cast("double") >= t - eps).as("rank_ok"))
    },
    // BPE lossless round-trip CONTRACT: encoding a word under the learned
    // merges and concatenating its subwords must reproduce word + </w> for
    // EVERY vocabulary entry — merges only ever concatenate adjacent
    // symbols, and this query makes that invariant a hashed row
    "q_bpe_roundtrip" -> { (s, d) =>
      val wc = wordCountsCkpt(s, d)
      val merges = graft.operators.Bpe.trainMerges(wc, 10)
      graft.operators.Bpe.encodeWords(wc, merges)
        .select((array_join(col("syms"), "") ===
          concat(col("word"), lit(graft.operators.Bpe.EndMark))).as("ok"))
        .agg(count(lit(1)).as("n_words"),
          sum(when(col("ok"), 1L).otherwise(0L)).as("n_roundtrip"))
    },
    // unbiased pass@k (HumanEval eq. 1) over per-user attempt histories:
    // telescoped product unrolled per literal k, e6 micros before the mean
    "q_pass_at_k" -> { (s, d) =>
      graft.operators.PassAtK.passAtK(Tables(s, d).events)
    },
    // Weight-of-Evidence table (operators.WoeBinning): activity-count
    // bins vs the purchase label — exact per-bin counts, ONE ln per bin
    // floor-6 quantized (the Markov-entropy ln precedent), per-bin IV
    // terms as e6 BIGINTs; empty-class bins report NULL woe + zero IV
    "q_woe_bins" -> { (s, d) =>
      graft.operators.WoeBinning.woeTable(woeBinnedUsers(s, d))
    },
    // the feature's Information Value: bin counts + the exact-integer IV
    // total over the defined bins
    "q_feature_iv" -> { (s, d) =>
      graft.operators.WoeBinning.informationValue(woeBinnedUsers(s, d))
    },
  )
}
