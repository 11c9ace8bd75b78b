package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Money, TextFunctions => TF, VectorFunctions => VF}
import graft.ml.{Heuristic, IntentModel, Recommender, Undersample}
import graft.operators.{AbTest, AsOfJoin, Association, Attribution, Autocorrelation, Avi, Changepoint, Churn, Collocations, Components, Concentration, Cuped, Decontaminate, Dedup, Dispersion, Diversity, Dsir, Featurize, GmmReplay, GopherFilter, GroupCap, HashSplit, IntervalOverlap, IvfReplay, KMeansReplay, LmScore, Mixture, Multimodal, Packing, Pareto, Paths, PiiScrub, QuantileNormalize, RankTest, Repetition, RepetitionCoverage, Rfm, SemanticDedup, SessionConf, Sessionize, Similarity, SourceProfile, Streaks, Tempo, Wavelet, WeightedSample}
import graft.sources.Tables
import graft.streaming.SessionWindows
import graft.oracles.SharedCtes._
import graft.oracles.StatsOracles._
import graft.oracles.SketchOracles._
import graft.oracles.VectorOracles._
import graft.oracles.TextOracles._
import graft.oracles.GraphOracles._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator (or operator pipeline) from the
  * SURVEY §2 inventory or the training-data-pipeline extension set; entries
  * with a deterministic relational meaning also appear in `oracleSql` as
  * ANSI SQL that DuckDB runs over the same parquet tables. Column names are
  * aligned on both sides (the driver's compare sorts columns by name).
  */
object SparkEntry {

  /** The synthetic `events` table mapped to the reference clickstream shape:
    * day-scoped sessions (`user_id` + day), `value`→price, JSON `props.k`
    * →product_id, `click`→cart. See sources.Tables.clickstream for the
    * rename-only variant; the day-session key gives a realistic label mix.
    */
  /** Near-dup edge list shared by q_dedup_components / q_dedup_keep: pairs
    * of docs sharing ≥5 distinct 3-shingles, via the bucket spelling (same
    * economics as Dedup's LSH banding) — ONE groupBy builds each shingle's
    * posting list, the size filter IS the hot-shingle cap, and pairs come
    * from a bounded double-explode (≤ cap² per shingle): one corpus scan,
    * two shuffles, vs a posting self-join's three scans and four.
    */
  private def shingleEdges(docs: DataFrame): DataFrame = {
    val e = docs
      .select(col("doc_id"), explode(graft.operators.Dedup.shingles(col("text"))).as("sh"))
      .groupBy(col("sh")).agg(collect_list(col("doc_id")).as("docs"))
      .filter(size(col("docs")) <= 20)
      .select(explode(col("docs")).as("src"), col("docs"))
      .select(col("src"), explode(col("docs")).as("dst"))
      .filter(col("dst") > col("src"))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 5)
      .select(col("src"), col("dst"))
    // Deliberately NOT persisted (r12 A/B, sf0.1): consumers reference the
    // subplan twice via their undirected unions, but both branches run in
    // ONE scan-bound job with idle cores — the double build is parallel
    // slack. A lazy persist makes the branches race the un-populated cache
    // (slowest option); an eager count serializes an extra job + cache
    // write and nets out slower for the Components family too. Leave lazy.
    e
  }

  /** Gap-session bounds shared by the interval-overlap queries: one row per
    * (user, session) with inclusive [start_s, end_s] epoch-second bounds.
    */
  private def gapSessionBounds(spark: SparkSession, dir: String): DataFrame =
    Sessionize.gapSessions(Tables(spark, dir).events, "user_id", "ts",
        gapSeconds = 1800L, tieBreakCol = Some("event_id"))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(min(col("ts").cast("long")).as("start_s"),
        max(col("ts").cast("long")).as("end_s"))
      // overlapCounts reads this frame four times (probes + points, twice);
      // the Verify/Bench harness unpersists between queries
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  private def clickstream(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events.select(
      concat(col("user_id").cast("string"), lit("_"), date_format(col("ts"), "yyyy-MM-dd"))
        .as("user_session"),
      col("event_type"),
      regexp_extract(col("props"), "\"k\": (\\d+)", 1).as("product_id"),
      col("value").as("price"),
      col("ts").as("event_time")
    )

  private val ClickConf = SessionConf(
    sessionCol = "user_session",
    typeCol = "event_type",
    tsCol = "event_time",
    priceCol = "price",
    itemCol = "product_id",
    viewType = "view",
    cartType = "click",
    purchaseType = "purchase"
  )

  /** Flagship: leakage-free session features (S1→P1→W1→P4→A1→P2).
    * avg_price is rounded to 6 decimals so parallel-summation order noise
    * (~1e-13) can't flip the oracle compare at a formatting boundary.
    */
  private def sessionFeatures(spark: SparkSession, dir: String): DataFrame =
    Featurize
      .leakageFreeSessionFeatures(clickstream(spark, dir), ClickConf)
      .withColumn("avg_price", round(col("avg_price"), 6))

  /** Formula-synthesized uncompressed-DIB AVI fixtures over the video
    * rows (doc_id % 3 = 2): REAL RIFF bytes built per row from pure
    * id-derived parameters (odd widths force stride padding on every
    * file); odd doc_ids truncated mid-header. Shared by q_media_avi_meta
    * and q_media_avi_frames; the oracles predict from the same formulas.
    */
  private def aviFixture(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables(s, d).documents
      .filter(pmod(col("doc_id"), lit(3)) === 2)
      .select(col("doc_id").cast("long")).as[Long]
      .map { id =>
        val full = graft.operators.Avi.synthAvi(
          width = 7 + (id % 4).toInt * 4,
          height = 6 + (id % 3).toInt * 4,
          nFrames = 2 + (id % 3).toInt,
          microSecPerFrame = 33333L + (id % 7) * 1000L,
          pixel = (f, y, x, c) =>
            ((id + 31L * f + 7L * y + 3L * x + 11L * c) % 251L).toInt)
        (id, if (id % 2 == 1) full.take(20) else full)
      }.toDF("doc_id", "content")
  }

  def entry(spark: SparkSession): DataFrame =
    sessionFeatures(spark, "/root/testdata/sf0.001")

  /** Quasi-identifier view shared by the privacy battery: customer
    * (segment, nation, 1k$-acctbal band).
    */
  /** Multi-line document fixture for the LineDedup queries: deterministic
    * boilerplate planted over the (newline-free) documents table. The SQL
    * twin is [[PlantedLinesCte]] — keep the two spellings in lockstep.
    */
  private def plantedLineDocs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents.select(
      col("doc_id"),
      concat_ws("\n",
        col("text"),
        when(col("doc_id") % 3 === 0, lit("subscribe to our newsletter")),
        when(col("doc_id") % 5 === 0, lit("all rights reserved")),
        when(col("doc_id") % 7 === 0, col("text"))
      ).as("text"))

  /** Synthetic URL fixture for the UrlFunctions queries (the tables have
    * no URL column): mixed-case scheme/host, optional trailing slash,
    * tracking params, unsorted real params, and a fragment — every
    * canonicalization rule exercised. SQL twin: [[SyntheticUrlsCte]].
    */
  private def syntheticUrls(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).customer.select(
      col("c_custkey"),
      concat(
        lit("HTTPS://WWW.Shop"), (col("c_custkey") % 7).cast("string"),
        lit(".Example.COM/Seg/"), col("c_mktsegment"),
        when(col("c_custkey") % 3 === 0, lit("/")).otherwise(lit("")),
        lit("?utm_source=mail&utm_campaign=x&id="), (col("c_custkey") % 50).cast("string"),
        when(col("c_custkey") % 2 === 0, lit("&fbclid=abc")).otherwise(lit("")),
        when(col("c_custkey") % 4 === 0, lit("&b=2&a=1")).otherwise(lit("")),
        lit("#section"), (col("c_custkey") % 5).cast("string")
      ).as("url"))

  /** Deterministic HTML shell around the documents (the tables have no
    * HTML column): title + style + script subtrees, an entity in visible
    * text, and two anchors with doc-varying mixed-case hosts and tracking
    * params — every HtmlFunctions + UrlFunctions rule exercised. SQL twin
    * spelled inline in the q_html_* oracles.
    */
  private def syntheticHtml(text: org.apache.spark.sql.Column,
      id: org.apache.spark.sql.Column): org.apache.spark.sql.Column = concat(
    lit("<html><head><title>Doc</title><style>p{color:red}</style></head>" +
      "<body><h1>Heading &amp; more</h1><p>"),
    text,
    lit("</p><a href=\"https://Example.com/p/"), (id % 5).cast("string"),
    lit("?utm_source=x&b=2&a=1#f\">L1</a> <a href=\"http://Host"), (id % 3).cast("string"),
    lit(".org/x/\">L2</a><script>var s=1;</script></body></html>"))

  private def privacyQi(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).customer.select(
      col("c_mktsegment").as("seg"),
      col("c_nationkey").as("nat"),
      floor(col("c_acctbal") / lit(1000.0d)).cast("long").as("band"))

  // ------------------------------------------------------------------------
  // Queries
  // ------------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
        clickstream(s, d),
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
        clickstream(s, d),
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
        clickstream(s, d),
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
      val wc = graft.operators.Vocab.wordCounts(Tables(s, d).documents)
      val merges = graft.operators.Bpe.trainMerges(wc, 10)
      graft.operators.Bpe.encodeWords(wc, merges)
        .select((array_join(col("syms"), "") ===
          concat(col("word"), lit(graft.operators.Bpe.EndMark))).as("ok"))
        .agg(count(lit(1)).as("n_words"),
          sum(when(col("ok"), 1L).otherwise(0L)).as("n_roundtrip"))
    },
    // ---- relational core over the TPC-H-ish tables (joins/agg/sort/limit) ----
    "q1_pricing_summary" -> { (s, d) =>
      Tables(s, d).lineitem
        .filter(col("l_shipdate") <= expr("TIMESTAMP '1998-09-02 00:00:00'"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          Money.moneySum(col("l_quantity")).as("sum_qty"),
          Money.moneySum(col("l_extendedprice")).as("sum_base_price"),
          Money.moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("sum_disc_price"),
          Money.moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))
            .as("sum_charge"),
          round(avg(col("l_quantity")), 6).as("avg_qty"),
          round(avg(col("l_extendedprice")), 6).as("avg_price"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order")
        )
    },
    "q3_top_orders" -> { (s, d) =>
      val t = Tables(s, d)
      t.customer.filter(col("c_mktsegment") === "BUILDING")
        .join(t.orders.filter(col("o_orderdate") < expr("TIMESTAMP '1998-07-01 00:00:00'")),
          col("c_custkey") === col("o_custkey"))
        .join(t.lineitem.filter(col("l_shipdate") > expr("TIMESTAMP '1998-07-01 00:00:00'")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(Money.microsSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev_u"))
        .orderBy(col("rev_u").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), col("o_orderdate"), Money.microsToMoney(col("rev_u")).as("revenue"))
    },
    "q5_region_revenue" -> { (s, d) =>
      val t = Tables(s, d)
      // dims are tiny: broadcast region→nation→supplier chain; the only big
      // shuffles are lineitem⋈orders and orders⋈customer on their keys.
      val asiaNations = broadcast(
        t.nation.join(broadcast(t.region.filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
      )
      t.customer
        .join(t.orders, col("c_custkey") === col("o_custkey"))
        .join(t.lineitem, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(asiaNations, col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(Money.moneySum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
    },
    "q4_priority_check" -> { (s, d) =>
      val t = Tables(s, d)
      t.orders
        .filter(col("o_orderdate").between(
          expr("TIMESTAMP '1996-01-01 00:00:00'"), expr("TIMESTAMP '1996-12-31 00:00:00'")))
        .join(t.lineitem,
          col("o_orderkey") === col("l_orderkey") && col("l_shipdate") > col("o_orderdate"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    },
    "q6_forecast_revenue" -> { (s, d) =>
      Tables(s, d).lineitem
        .filter(col("l_shipdate").between(
          expr("TIMESTAMP '1996-01-01 00:00:00'"), expr("TIMESTAMP '1996-12-31 00:00:00'")) &&
          col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24)
        .agg(Money.moneySum(col("l_extendedprice") * col("l_discount")).as("revenue"))
    },
    "q10_returned_items" -> { (s, d) =>
      val t = Tables(s, d)
      t.customer
        .join(t.orders, col("c_custkey") === col("o_custkey"))
        .join(t.lineitem.filter(col("l_returnflag") === "R"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(Money.microsSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev_u"))
        .orderBy(col("rev_u").desc, col("c_custkey"))
        .limit(20)
        .select(col("c_custkey"), col("c_name"), col("n_name"),
          Money.microsToMoney(col("rev_u")).as("revenue"))
    },
    "q12_shipmode_priority" -> { (s, d) =>
      val t = Tables(s, d)
      t.orders.join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") >= expr("TIMESTAMP '1996-01-01 00:00:00'"))
        .groupBy(col("l_linestatus"))
        .agg(
          count(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)).as("high_line_count"),
          count(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)).as("low_line_count")
        )
    },
    // TPC-H q7 shape: bidirectional nation-pair trade volume by year —
    // the double-aliased dimension join (same nation table under two roles)
    "q7_volume_shipping" -> { (s, d) =>
      val t = Tables(s, d)
      val n1 = t.nation.select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
      val n2 = t.nation.select(col("n_nationkey").as("c_nkey"), col("n_name").as("cust_nation"))
      t.supplier
        .join(t.lineitem, col("l_suppkey") === col("s_suppkey"))
        .join(t.orders, col("o_orderkey") === col("l_orderkey"))
        .join(t.customer, col("c_custkey") === col("o_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nkey"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nkey"))
        .filter(
          ((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
            (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1")) &&
            col("l_shipdate").between(
              expr("TIMESTAMP '1996-01-01 00:00:00'"), expr("TIMESTAMP '1997-12-31 00:00:00'")))
        .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).as("l_year"))
        .agg(Money.moneySum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
    },
    // TPC-H q8 shape: one nation's share of a region's PROMO-part revenue
    // by year — conditional-sum ratio in exact integer micros (q14 pattern)
    "q8_market_share" -> { (s, d) =>
      val t = Tables(s, d)
      val region0Nations = broadcast(
        t.nation.join(broadcast(t.region.filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey").as("c_nkey")))
      val suppNation = broadcast(
        t.nation.select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation")))
      val volU = round(col("l_extendedprice") * (lit(1) - col("l_discount")) * lit(1e6), 0)
        .cast("long")
      t.lineitem
        .join(broadcast(t.part.filter(col("p_type") === "PROMO")),
          col("l_partkey") === col("p_partkey"))
        .join(t.orders, col("o_orderkey") === col("l_orderkey"))
        .filter(col("o_orderdate").between(
          expr("TIMESTAMP '1996-01-01 00:00:00'"), expr("TIMESTAMP '1997-12-31 00:00:00'")))
        .join(t.customer, col("c_custkey") === col("o_custkey"))
        .join(region0Nations, col("c_nationkey") === col("c_nkey"))
        .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
        .join(suppNation, col("s_nationkey") === col("s_nkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(round(
          sum(when(col("supp_nation") === "NATION_3", volU).otherwise(0L)).cast("double") /
            sum(volU), 6).as("mkt_share"))
    },
    // TPC-H q2 SHAPE (partsupp-free adaptation — the testdata ships no
    // partsupp, so the part–supplier cost relation is the one OBSERVED in
    // lineitem: pair cost = min unit price ever shipped): for each small
    // part sourced from EUROPE, the supplier achieving the minimum cost —
    // the correlated-min / argmin-per-key plan shape, spelled as a window
    // with a total (cost, suppkey) tie-break. Unit price stays exact:
    // micros DIV integer quantity (both engines floor on non-negatives).
    "q2_min_cost_supplier" -> { (s, d) =>
      val t = Tables(s, d)
      val eurSupp = t.supplier
        .join(broadcast(t.nation), col("n_nationkey") === col("s_nationkey"))
        .join(broadcast(t.region.filter(col("r_name") === "EUROPE")),
          col("r_regionkey") === col("n_regionkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_name"))
      val pairCost = t.lineitem
        .join(broadcast(t.part.filter(col("p_size") < 15)),
          col("p_partkey") === col("l_partkey"))
        .join(eurSupp, col("s_suppkey") === col("l_suppkey"))
        .groupBy(col("p_partkey"), col("p_brand"), col("s_suppkey"),
          col("s_name"), col("n_name"))
        .agg(min(expr(
          "CAST(round(l_extendedprice * 1e6) AS BIGINT) DIV CAST(round(l_quantity) AS BIGINT)"))
          .as("cost_micros"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("p_partkey")).orderBy(col("cost_micros"), col("s_suppkey"))
      pairCost.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("p_partkey"), col("p_brand"), col("s_name"),
          col("n_name").as("nation"), col("cost_micros"))
    },
    // TPC-H q9 SHAPE (partsupp-free: profit ≈ revenue, no supplycost term):
    // nation × year profit rollup over name-matched parts — the classic
    // 5-way join + LIKE + multi-dim aggregate
    "q9_product_profit" -> { (s, d) =>
      val t = Tables(s, d)
      t.lineitem
        .join(broadcast(t.part.filter(col("p_name").contains("widget"))),
          col("p_partkey") === col("l_partkey"))
        .join(t.supplier, col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(t.nation), col("n_nationkey") === col("s_nationkey"))
        .join(t.orders, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(Money.moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("sum_profit"))
    },
    // TPC-H q11 SHAPE (partsupp-free: per-part value = AFRICA suppliers'
    // shipped extendedprice — a region, not a single nation, so the
    // supplier base is non-empty at every SF): parts above 1.2× the MEAN
    // part value. TPC-H's own fraction scales with SF, so the scale-free
    // spelling compares against the TRUNCATED mean (value·10 >
    // ⌊total/n⌋·12 — Spark DIV ≡ DuckDB // on the non-negative operands):
    // no SF-tuned constant, and no width blow-up either — the r17 cross-
    // multiply value·n·10 approached BIGINT overflow at sf1e4+ (ANSI would
    // throw, not corrupt, but the query dies); ⌊mean⌋·12 stays ~1e13.
    "q11_important_parts" -> { (s, d) =>
      val t = Tables(s, d)
      val afr = broadcast(t.nation
        .join(broadcast(t.region.filter(col("r_name") === "AFRICA")),
          col("r_regionkey") === col("n_regionkey"))
        .select(col("n_nationkey")))
      val base = t.lineitem
        .join(t.supplier, col("s_suppkey") === col("l_suppkey"))
        .join(afr, col("n_nationkey") === col("s_nationkey"))
        .groupBy(col("l_partkey").as("p_partkey"))
        .agg(sum(expr("CAST(round(l_extendedprice * 1e6) AS BIGINT)"))
          .as("value_micros"))
      val tot = base.agg(sum(col("value_micros")).as("total_micros"),
        count(lit(1)).as("n_parts"))
      base.crossJoin(broadcast(tot))
        .filter(col("value_micros") * 10 > expr("total_micros DIV n_parts") * 12)
        .select(col("p_partkey"), col("value_micros"))
    },
    // TPC-H q16 SHAPE (part–supplier relation from lineitem): supplier
    // counts per (brand, type, size) excluding the complaint set — the
    // NOT-IN (anti-join) + COUNT DISTINCT plan shape; the complaint set is
    // the deterministic s_suppkey % 7 = 0 slice (synthetic s_comment-free
    // schema)
    "q16_supplier_counts" -> { (s, d) =>
      val t = Tables(s, d)
      val complaints = t.supplier.filter(pmod(col("s_suppkey"), lit(7)) === 0)
        .select(col("s_suppkey"))
      t.lineitem
        .join(broadcast(t.part.filter(col("p_brand") =!= "Brand#1" &&
          col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))),
          col("p_partkey") === col("l_partkey"))
        .join(broadcast(complaints), col("s_suppkey") === col("l_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
    },
    // TPC-H q20 SHAPE (availqty → shipped quantity): suppliers whose 1997
    // shipped quantity of 'small%' parts exceeds 1.3× the mean per
    // supplier — the nested semi-join chain with a grouped HAVING vs a
    // scalar aggregate, against the truncated mean (qty·10 > ⌊total/n⌋·13
    // — the q11 width-safe convention; DIV ≡ // on non-negatives)
    "q20_excess_suppliers" -> { (s, d) =>
      val t = Tables(s, d)
      val pq = t.lineitem
        .filter(col("l_shipdate").between(
          expr("TIMESTAMP '1997-01-01 00:00:00'"), expr("TIMESTAMP '1997-12-31 00:00:00'")))
        .join(broadcast(t.part.filter(col("p_name").startsWith("small"))),
          col("p_partkey") === col("l_partkey"))
        .groupBy(col("l_suppkey"))
        .agg(sum(expr("CAST(round(l_quantity) AS BIGINT)")).as("qty"))
      val tot = pq.agg(sum(col("qty")).as("tq"), count(lit(1)).as("ns"))
      val excess = pq.crossJoin(broadcast(tot))
        .filter(col("qty") * 10 > expr("tq DIV ns") * 13)
        .select(col("l_suppkey"))
      t.supplier
        .join(excess, col("l_suppkey") === col("s_suppkey"), "left_semi")
        .join(broadcast(t.nation), col("n_nationkey") === col("s_nationkey"))
        .select(col("s_name"), col("n_name").as("nation"))
    },
    // TPC-H q13 shape: distribution of customers by order count (left join
    // so zero-order customers land in the c_count=0 bucket)
    "q13_customer_distribution" -> { (s, d) =>
      val t = Tables(s, d)
      t.customer
        .join(t.orders, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    },
    // TPC-H q18 shape: top large orders by total quantity (group-filter on
    // an aggregate, then enrich through orders/customer)
    "q18_large_orders" -> { (s, d) =>
      val t = Tables(s, d)
      val big = t.lineitem.groupBy(col("l_orderkey"))
        .agg(Money.moneySum(col("l_quantity")).as("total_qty"))
        .filter(col("total_qty") > 150.0)
      big
        .join(t.orders, col("o_orderkey") === col("l_orderkey"))
        .join(t.customer, col("c_custkey") === col("o_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_totalprice"), col("total_qty"))
        .orderBy(col("total_qty").desc, col("o_orderkey"))
        .limit(100)
    },
    // TPC-H q17 shape — correlated scalar subquery, decorrelated the
    // scale-right way: filter parts FIRST (broadcast), then one window
    // over the surviving lines computes each part's average (selecting
    // whole partkey groups can't change a per-partkey average), so the
    // per-part avg costs one shuffle over the small selection instead of
    // an aggregate over all of lineitem. Quantities are integral, so their
    // double sum is exact in any order and the 0.2*avg boundary compares
    // identically cross-engine.
    "q17_small_qty_revenue" -> { (s, d) =>
      val t = Tables(s, d)
      val sel = t.lineitem
        .join(broadcast(t.part.filter(col("p_brand") === "Brand#4" && col("p_size") <= 5)
          .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
      sel
        .withColumn("avg_qty", avg(col("l_quantity")).over(Window.partitionBy(col("l_partkey"))))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg(round(Money.moneySum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"))
    },
    // TPC-H q19 shape — disjunction of brand/size/quantity conjuncts INSIDE
    // the join condition: Catalyst extracts the common l_partkey equality
    // for the broadcast hash join and evaluates the OR as a residual, the
    // shape that breaks engines which only push conjunctive predicates
    "q19_disjunctive_revenue" -> { (s, d) =>
      val t = Tables(s, d)
      t.lineitem.join(broadcast(t.part),
        col("l_partkey") === col("p_partkey") && (
          (col("p_brand") === "Brand#4" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 20) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#19" && col("p_size").between(1, 25) &&
            col("l_quantity").between(20, 30))))
        .agg(Money.moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
    },
    // TPC-H q21 shape — EXISTS + NOT EXISTS against the same relation with
    // different predicates, spelled as a left-semi then left-anti join
    // (both shuffle on l_orderkey; no row multiplication): suppliers who
    // were the ONLY supplier to have a returned line on a multi-supplier
    // finished order
    "q21_sole_returned_supplier" -> { (s, d) =>
      val t = Tables(s, d)
      val l1 = t.lineitem.filter(col("l_returnflag") === "R")
        .join(t.orders.filter(col("o_orderstatus") === "F").select(col("o_orderkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"))
      val others = t.lineitem
        .select(col("l_orderkey").as("x_orderkey"), col("l_suppkey").as("x_suppkey"))
      val returnedOthers = t.lineitem.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("x_orderkey"), col("l_suppkey").as("x_suppkey"))
      l1
        .join(others, col("x_orderkey") === col("l_orderkey") &&
          col("x_suppkey") =!= col("l_suppkey"), "leftsemi")
        .join(returnedOthers, col("x_orderkey") === col("l_orderkey") &&
          col("x_suppkey") =!= col("l_suppkey"), "leftanti")
        .join(broadcast(t.supplier), col("s_suppkey") === col("l_suppkey"))
        .groupBy(col("s_name")).agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name")).limit(100)
    },
    // TPC-H q22 shape — scalar-subquery threshold (global average balance,
    // broadcast as a 1-row frame) + anti-join + per-nation rollup:
    // above-average-balance customers who never placed an urgent order.
    // The threshold is computed in exact integer micros (sum < 2^53, so
    // the double division is bit-identical cross-engine).
    "q22_idle_rich_customers" -> { (s, d) =>
      val t = Tables(s, d)
      val micros = round(col("c_acctbal") * lit(1e6), 0).cast("long")
      val thresh = t.customer.filter(col("c_acctbal") > 0.0)
        .agg((sum(micros).cast("double") / count(lit(1))).as("avg_micros"))
      t.customer
        .crossJoin(broadcast(thresh))
        .filter(micros > col("avg_micros"))
        .join(t.orders.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey")),
          col("o_custkey") === col("c_custkey"), "leftanti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_cust"),
          Money.microsToMoney(sum(micros)).as("total_acctbal"))
    },
    // TPC-H Q15 (the one remaining numbered query the shipped schema can
    // express — q2/q9/q11/q16/q20 need partsupp, which doesn't exist):
    // top supplier by 1996-Q1 revenue; the max rides as a broadcast 1-row
    // frame, ties (if any) returned by both engines identically
    "q15_top_supplier" -> { (s, d) =>
      val t = Tables(s, d)
      val revenue = t.lineitem
        .filter(col("l_shipdate") >= expr("TIMESTAMP '1996-01-01 00:00:00'") &&
          col("l_shipdate") < expr("TIMESTAMP '1996-04-01 00:00:00'"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(Money.moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("total_revenue"))
      val maxRev = revenue.agg(max(col("total_revenue")).as("_max_rev"))
      t.supplier.join(revenue, col("s_suppkey") === col("supplier_no"))
        .crossJoin(broadcast(maxRev))
        .filter(col("total_revenue") === col("_max_rev"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
    },
    "q14_promo_effect" -> { (s, d) =>
      val t = Tables(s, d)
      t.lineitem
        .filter(col("l_shipdate").between(
          expr("TIMESTAMP '1997-01-01 00:00:00'"), expr("TIMESTAMP '1997-12-31 00:00:00'")))
        .join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
        .agg {
          // exact integer micros for both sums → the ratio is a single
          // deterministic double division, immune to partition order
          val revU = round(col("l_extendedprice") * (lit(1) - col("l_discount")) * lit(1e6), 0)
            .cast("long")
          round(lit(100.0) *
            sum(when(col("p_type") === "PROMO", revU).otherwise(0L)) /
            sum(revU), 6).as("promo_revenue_pct")
        }
    },
    "q_part_brand_stats" -> { (s, d) =>
      Tables(s, d).part.groupBy(col("p_brand")).agg(
        count(lit(1)).as("n_parts"),
        // exact micros sum → double division: order-independent (a bare
        // avg(double) was the one unrounded money column left in the gate)
        (Money.microsSum(col("p_retailprice")).cast("double") / lit(1e6) / count(lit(1)))
          .as("avg_retail"),
        countDistinct(col("p_type")).as("n_types"),
        min(col("p_size")).as("min_size"),
        max(col("p_size")).as("max_size")
      )
    },
    "q_customer_orders" -> { (s, d) =>
      val t = Tables(s, d)
      val perCust = t.orders.groupBy(col("o_custkey")).agg(
        count(lit(1)).as("n_orders_raw"),
        Money.microsSum(col("o_totalprice")).as("total_spent_u")
      )
      t.customer
        .join(perCust, col("c_custkey") === col("o_custkey"), "left")
        .select(
          col("c_custkey"), col("c_name"), col("c_mktsegment"),
          coalesce(col("n_orders_raw"), lit(0L)).as("n_orders"),
          Money.microsToMoney(coalesce(col("total_spent_u"), lit(0L))).as("total_spent")
        )
    },
    "q_top_customers" -> { (s, d) =>
      val t = Tables(s, d)
      t.customer.join(t.orders, col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(Money.microsSum(col("o_totalprice")).as("rev_u"), count(lit(1)).as("n_orders"))
        .orderBy(col("rev_u").desc, col("c_custkey"))
        .limit(10)
        .select(col("c_custkey"), col("c_name"),
          Money.microsToMoney(col("rev_u")).as("revenue"), col("n_orders"))
    },
    // ---- relational breadth: set ops, semi/anti joins, rollup, ranking,
    // ---- analytic windows, date/string functions, percentiles ----
    "q_customers_without_orders" -> { (s, d) =>
      val t = Tables(s, d)
      t.customer
        .join(t.orders, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    },
    "q_building_buyers" -> { (s, d) =>
      val t = Tables(s, d)
      t.customer.filter(col("c_mktsegment") === "BUILDING")
        .join(t.orders, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
    },
    "q_segment_intersect" -> { (s, d) =>
      val c = Tables(s, d).customer
      c.filter(col("c_acctbal") > 5000).select(col("c_mktsegment"))
        .intersect(c.filter(col("c_acctbal") < 1000).select(col("c_mktsegment")))
    },
    "q_rollup_revenue" -> { (s, d) =>
      Tables(s, d).lineitem
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n"))
    },
    "q_top_order_per_customer" -> { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables(s, d).orders
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    },
    "q_event_gaps" -> { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables(s, d).events
        .withColumn("ts_s", col("ts").cast("long"))
        .withColumn("gap", col("ts_s") - lag(col("ts_s"), 1).over(w))
        .filter(col("gap").isNotNull)
        .groupBy(col("user_id"))
        .agg(round(avg(col("gap")), 6).as("avg_gap_s"), max(col("gap")).as("max_gap_s"),
          count(lit(1)).as("n_gaps"))
    },
    // native session_window spelling of gap sessionization — must agree with
    // the lag+cumsum spelling (q_gap_sessions) on counts and start times
    "q_session_window" -> { (s, d) =>
      Tables(s, d).events
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"), Money.moneySum(col("value")).as("total_value"))
        .select(col("user_id"), col("w.start").cast("long").as("start_s"),
          col("n_events"), col("total_value"))
    },
    "q_gap_sessions" -> { (s, d) =>
      Sessionize.gapSessions(Tables(s, d).events, "user_id", "ts",
          gapSeconds = 1800L, tieBreakCol = Some("event_id"))
        .groupBy(col("user_id"), col("session_idx"))
        .agg(count(lit(1)).as("n_events"),
          (max(col("ts").cast("long")) - min(col("ts").cast("long"))).as("duration_s"),
          Money.moneySum(col("value")).as("total_value"))
    },
    // interval overlap WITHOUT an interval self-join: per-session count of
    // other sessions (any user) open at the same time, via two bucketized
    // order statistics (IntervalOverlap.countLE). The oracle states the same
    // counts through an independent spelling — a sorted running sum over the
    // merged start/end point stream.
    "q_session_overlap" -> { (s, d) =>
      IntervalOverlap.overlapCounts(gapSessionBounds(s, d),
        Seq("user_id", "session_idx"), "start_s", "end_s", width = 3600L)
    },
    // concurrency timeline: per-hour started/ended/still-open session counts;
    // the only ordered pass is over the tiny per-hour table
    "q_concurrency_timeline" -> { (s, d) =>
      IntervalOverlap.concurrencyTimeline(gapSessionBounds(s, d), "start_s", "end_s", 3600L)
    },
    // densification: regular per-user hourly grid over each user's own span,
    // missing hours zero-filled, hourly avg value carried forward
    "q_gap_fill" -> { (s, d) =>
      val hourly = Tables(s, d).events
        .groupBy(col("user_id"),
          expr("CAST(ts AS LONG) DIV 3600").as("h"))
        .agg(count(lit(1)).as("n_events"), round(avg(col("value")), 6).as("v"))
      graft.operators.Densify
        .densify(hourly, "user_id", "h", counts = Seq("n_events"), carried = Seq("v"))
        .withColumnRenamed("v", "value_ff")
    },
    // linear-interpolation gap fill (Densify.interpolate): q_gap_fill's
    // spine, but gap hours land on the line between observed neighbors —
    // one exchange drives both direction windows
    "q_interpolate" -> { (s, d) =>
      val hourly = Tables(s, d).events
        .groupBy(col("user_id"),
          expr("CAST(ts AS LONG) DIV 3600").as("h"))
        .agg(round(avg(col("value")), 6).as("v"))
      val dense = graft.operators.Densify.spine(hourly, "user_id", "h")
        .join(hourly, Seq("user_id", "h"), "left")
      graft.operators.Densify.interpolate(dense, "user_id", "h", "v")
        .select(col("user_id"), col("h"), col("v"), col("v_interp"))
    },
    // Levenshtein verification of candidate pairs (operators.EditDistance):
    // the character-level near-dup check over the same adjacent-id
    // candidate window q_jaccard_adjacent uses — never all-pairs
    "q_editdist_verify" -> { (s, d) =>
      val docs = Tables(s, d).documents
      val pairs = docs
        .select(col("doc_id").as("id1"), (col("doc_id") + 1).as("id2"))
        .union(docs.select(col("doc_id").as("id1"), (col("doc_id") + 2).as("id2")))
      graft.operators.EditDistance.verify(pairs, docs)
    },
    // explicit window frames: running total + trailing moving average
    "q_running_revenue" -> { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      val running = w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val trailing3 = w.rowsBetween(-2, 0)
      Tables(s, d).orders.select(
        col("o_custkey"), col("o_orderkey"),
        Money.moneySumOver(col("o_totalprice"), running).as("running_total"),
        round(avg(col("o_totalprice")).over(trailing3), 6).as("trailing3_avg")
      )
    },
    // window-function medley (§2.5 breadth): lead gap, ntile quartile,
    // percent_rank / cume_dist — total order via the orderkey tie-break so
    // every rank is engine-independent
    "q_order_window_funcs" -> { (s, d) =>
      val seqW = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val priceW = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables(s, d).orders.select(
        col("o_custkey"), col("o_orderkey"),
        (lead(col("o_orderdate").cast("timestamp").cast("long"), 1).over(seqW) -
          col("o_orderdate").cast("timestamp").cast("long")).as("next_gap_s"),
        ntile(4).over(priceW).as("price_quartile"),
        round(percent_rank().over(priceW), 6).as("price_pct_rank"),
        round(cume_dist().over(priceW), 6).as("price_cume_dist"))
    },
    // pivot: wide per-hour event-type counts with an explicit value list
    // (deterministic column set; absent combos coalesced to 0 on both sides)
    "q_pivot_type_hour" -> { (s, d) =>
      Tables(s, d).events
        .groupBy(hour(col("ts")).as("hour_of_day"))
        .pivot("event_type", Seq("view", "click", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .select(col("hour_of_day"),
          coalesce(col("view"), lit(0L)).as("n_view"),
          coalesce(col("click"), lit(0L)).as("n_click"),
          coalesce(col("purchase"), lit(0L)).as("n_purchase"),
          coalesce(col("signup"), lit(0L)).as("n_signup"),
          coalesce(col("error"), lit(0L)).as("n_error"))
    },
    // §2.3 breadth: FULL OUTER join of two aggregated key spaces (event
    // users vs order customers), survivors from either side zero-filled
    "q_full_outer_activity" -> { (s, d) =>
      val t = Tables(s, d)
      val ev = t.events.groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
      val ord = t.orders.groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
      ev.join(ord, col("user_id") === col("o_custkey"), "full_outer")
        .select(coalesce(col("user_id"), col("o_custkey")).as("key_id"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"))
    },
    // the spark.sql entry path: the IDENTICAL ANSI text runs here over temp
    // views and in DuckDB as the oracle — proving engine-portable SQL intake
    "q_sql_parity" -> { (s, d) =>
      val t = Tables(s, d)
      t.orders.createOrReplaceTempView("orders")
      t.customer.createOrReplaceTempView("customer")
      s.sql(SqlParitySql)
    },
    // Spark 4 SQL pipe syntax (|>): the same relational algebra written as
    // a left-to-right operator chain — q_sql_parity's modern spelling
    "q_pipe_syntax" -> { (s, d) =>
      val t = Tables(s, d)
      t.orders.createOrReplaceTempView("orders")
      s.sql(
        """FROM orders
          ||> WHERE o_orderstatus = 'F'
          ||> AGGREGATE count(*) AS n_orders, min(o_orderkey) AS first_key,
          |             max(o_orderkey) AS last_key
          |   GROUP BY o_orderpriority
          ||> ORDER BY o_orderpriority""".stripMargin)
    },
    // cube with grouping_id: all four (status × priority) rollup combinations
    // in one pass (Expand + single aggregate, not four scans)
    "q_cube_status" -> { (s, d) =>
      Tables(s, d).orders
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          Money.moneySum(col("o_totalprice")).as("revenue"),
          grouping_id().cast("long").as("gid"))
    },
    // funnel: users whose first view < first click < first purchase
    "q_event_funnel" -> { (s, d) =>
      val firsts = Tables(s, d).events
        .groupBy(col("user_id"))
        .agg(
          min(when(col("event_type") === "view", col("ts"))).as("tv"),
          min(when(col("event_type") === "click", col("ts"))).as("tc"),
          min(when(col("event_type") === "purchase", col("ts"))).as("tp")
        )
      firsts.agg(
        count(lit(1)).as("n_users"),
        count(when(col("tv").isNotNull && col("tc").isNotNull && col("tv") < col("tc"), 1))
          .as("view_then_click"),
        count(when(col("tv").isNotNull && col("tc").isNotNull && col("tp").isNotNull &&
          col("tv") < col("tc") && col("tc") < col("tp"), 1)).as("full_funnel")
      )
    },
    "q_monthly_orders" -> { (s, d) =>
      Tables(s, d).orders
        .groupBy(date_trunc("month", col("o_orderdate")).cast("long").as("month_start_s"))
        .agg(count(lit(1)).as("n_orders"), Money.moneySum(col("o_totalprice")).as("total"))
    },
    "q_name_strings" -> { (s, d) =>
      Tables(s, d).customer
        .filter(col("c_name").like("%1%"))
        .select(col("c_custkey"), upper(col("c_name")).as("name_u"),
          length(col("c_name")).as("name_len"),
          substring(col("c_name"), 1, 8).as("name_prefix"))
    },
    "q_word_freq" -> { (s, d) =>
      graft.operators.Vocab.wordCounts(Tables(s, d).documents)
        .orderBy(col("n").desc, col("word"))
        .limit(20)
    },
    // mixture materialization: downsample per-language to 2:1:1:1:1 target
    // weights — binding language kept whole, md5-deterministic membership
    "q_mixture_rebalance" -> { (s, d) =>
      graft.operators.Mixture.rebalance(Tables(s, d).documents, "lang", "doc_id",
          Map("en" -> 2.0, "zh" -> 1.0, "es" -> 1.0, "de" -> 1.0, "fr" -> 1.0))
        .select(col("doc_id"), col("lang"), col("samp_rank"), col("keep_n"))
    },
    // token-budget mixture: per-language TOKEN budgets (mixtures are
    // specified in tokens); md5-order prefix of docs that fit the budget
    "q_mixture_tokens" -> { (s, d) =>
      val docs = Tables(s, d).documents.select(col("doc_id"), col("lang"),
        TF.tokenCount(col("text")).cast("long").as("n_tok"))
      graft.operators.Mixture.rebalanceTokens(docs, "lang", "doc_id", "n_tok",
          Map("en" -> 2.0, "zh" -> 1.0, "es" -> 1.0, "de" -> 1.0, "fr" -> 1.0))
        .select(col("doc_id"), col("lang"), col("n_tok"), col("tok_cum"), col("budget_n"))
    },
    // RAG-prep chunking: fixed-size token windows with overlap — tokenize
    // once, one transform(sequence) explode, zero shuffles
    "q_chunking" -> { (s, d) =>
      graft.operators.Chunker.chunk(Tables(s, d).documents,
        Seq("doc_id"), "text", chunkSize = 40, overlap = 10)
    },
    // content-defined chunking (operators.CdcChunker): boundary after any
    // position whose trailing 8-gram md5-48 ≡ 0 (mod 64) — shift-tolerant
    // chunk-level dedup prep, zero shuffles
    "q_cdc_chunks" -> { (s, d) =>
      graft.operators.CdcChunker.chunks(Tables(s, d).documents,
        Seq("doc_id"), "text", w = 8, divisor = 64)
    },
    // BPE trainer surface: iteration-0 adjacent-pair counts (the aggregate
    // every merge step re-runs), oracled; deterministic tie-break ordering
    "q_bpe_pair_counts" -> { (s, d) =>
      graft.operators.Bpe.pairCounts(
          graft.operators.Bpe.symbolize(
            graft.operators.Vocab.wordCounts(Tables(s, d).documents)))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(20)
    },
    // the learned merge table itself (iterative argmax — no single-SQL
    // oracle; BpeSpec pins the whole table against a naive reference)
    "q_bpe_merges" -> { (s, d) =>
      graft.operators.Bpe.mergeTable(s,
        graft.operators.Vocab.wordCounts(Tables(s, d).documents), nMerges = 10)
    },
    // the subword vocabulary those merges induce over the corpus (encode
    // path: merges as literals, one zero-shuffle projection + one groupBy)
    "q_bpe_subwords" -> { (s, d) =>
      val wc = graft.operators.Vocab.wordCounts(Tables(s, d).documents)
      val merges = graft.operators.Bpe.trainMerges(wc, 10)
      graft.operators.Bpe.subwordVocab(wc, merges)
        .orderBy(col("n_tokens").desc, col("subword"))
        .limit(30)
    },
    // BPE tokenizer fertility under the learned merges — the
    // q_unigram_fertility twin, so the two tokenizer families report the
    // same comparable diagnostic
    "q_bpe_fertility" -> { (s, d) =>
      val wc = graft.operators.Vocab.wordCounts(Tables(s, d).documents)
      graft.operators.Bpe.fertility(wc, graft.operators.Bpe.trainMerges(wc, 10))
    },
    // Byte-level BPE (GPT-2; operators.ByteBpe): BPE over UTF-8 BYTES
    // under the reversible 256-entry byte↔unicode table — zero OOV by
    // construction (all 256 single-byte symbols are base alphabet). The
    // table is a driver constant shipped as literals into BOTH engines;
    // the oracle replays symbolization from the hex dump via a VALUES
    // lookup, then the merges with q_bpe_merges' double-space replay.
    "q_bytebpe_merges" -> { (s, d) =>
      graft.operators.ByteBpe.mergeTable(s,
        graft.operators.Vocab.wordCounts(Tables(s, d).documents), nMerges = 10)
    },
    // the byte-level subword vocabulary those merges induce (encode path:
    // merges as literals, one zero-shuffle projection + one groupBy)
    "q_bytebpe_encode" -> { (s, d) =>
      val wc = graft.operators.Vocab.wordCounts(Tables(s, d).documents)
      val merges = graft.operators.ByteBpe.trainMerges(wc, 10)
      graft.operators.ByteBpe.subwordVocab(wc, merges)
        .orderBy(col("n_tokens").desc, col("subword"))
        .limit(30)
    },
    // the four tokenizer families' fertility side by side — the table a
    // practitioner actually reads when choosing a tokenizer (note the
    // populations differ by design: BPE/byte-BPE train on ALL words,
    // Unigram on printable-ASCII ≤12, WordPiece additionally excludes
    // '#'; BPE's n_pieces counts the </w> marker; byte-BPE's pieces are
    // byte-denominated — documented in each operator)
    "q_tokenizer_compare" -> { (s, d) =>
      val wc = graft.operators.Vocab.wordCounts(Tables(s, d).documents)
      graft.operators.Bpe.fertility(wc, graft.operators.Bpe.trainMerges(wc, 10))
        .select(lit("bpe").as("family"), col("*"))
        .unionByName(graft.operators.ByteBpe.fertility(wc,
            graft.operators.ByteBpe.trainMerges(wc, 10))
          .select(lit("bytebpe").as("family"), col("*")))
        .unionByName(graft.operators.UnigramLm.fertility(s, wc)
          .select(lit("unigram").as("family"), col("*")))
        .unionByName(graft.operators.WordPiece.fertility(wc)
          .select(lit("wordpiece").as("family"), col("*")))
    },
    // tokenizer population coverage: what fraction of word OCCURRENCES the
    // subword trainers' population predicates admit — the OOV-exposure
    // diagnostic that decides whether the ASCII restriction is acceptable
    "q_tokenizer_population" -> { (s, d) =>
      graft.operators.Vocab.wordCounts(Tables(s, d).documents).agg(
        sum(col("n")).as("n_occurrences"),
        count(lit(1)).as("n_distinct_words"),
        sum(when(graft.operators.UnigramLm.isTrainingWord(col("word")), col("n"))
          .otherwise(0L)).as("n_unigram_pop"),
        sum(when(graft.operators.WordPiece.isWordPieceWord(col("word")), col("n"))
          .otherwise(0L)).as("n_wordpiece_pop"))
        .select(col("n_occurrences"), col("n_distinct_words"),
          col("n_unigram_pop"), col("n_wordpiece_pop"),
          expr("n_unigram_pop * 1000000 DIV n_occurrences").as("unigram_cov_e6"),
          expr("n_wordpiece_pop * 1000000 DIV n_occurrences").as("wordpiece_cov_e6"))
    },
    // SentencePiece-style unigram LM tokenizer (operators.UnigramLm): the
    // OTHER public tokenizer family next to BPE — replayable Viterbi EM
    // (char + top-500-substring seed, integer-micros ln scores, exact
    // BIGINT path sums and counts, char-coverage floors, minCount prune).
    // The generated oracle (UnigramLmOracleSql) replays the seed, both EM
    // rounds' DP + path extraction, and the final prune, all in BIGINT.
    "q_unigram_lm" -> { (s, d) =>
      graft.operators.UnigramLm.train(s,
        graft.operators.Vocab.wordCounts(Tables(s, d).documents))
    },
    // ENCODE path: the corpus subword vocabulary the trained unigram table
    // induces (the q_bpe_subwords twin) — one zero-shuffle segmentation
    // projection + one aggregation after training
    "q_unigram_subwords" -> { (s, d) =>
      graft.operators.UnigramLm.subwordVocab(s,
        graft.operators.Vocab.wordCounts(Tables(s, d).documents))
    },
    // tokenizer fertility under the trained table: weighted pieces/word and
    // chars/piece — the standard tokenizer-quality diagnostic, all BIGINT
    "q_unigram_fertility" -> { (s, d) =>
      graft.operators.UnigramLm.fertility(s,
        graft.operators.Vocab.wordCounts(Tables(s, d).documents))
    },
    // lossless segmentation CONTRACT (the q_bpe_roundtrip pattern): every
    // training word must re-concatenate from its Viterbi pieces — the
    // oracle replays the pieces WITH their start offsets and re-assembles
    "q_unigram_roundtrip" -> { (s, d) =>
      graft.operators.UnigramLm.roundtripReport(s,
        graft.operators.Vocab.wordCounts(Tables(s, d).documents))
    },
    // WordPiece tokenizer (operators.WordPiece): the third classic subword
    // family next to BPE and Unigram-LM — deterministic frequency-substring
    // vocab (all single-char forms + top-V multi-char), greedy
    // longest-match-first encode via the native WordPieceSegment kernel
    "q_wordpiece_vocab" -> { (s, d) =>
      graft.operators.WordPiece.vocab(
        graft.operators.Vocab.wordCounts(Tables(s, d).documents))
    },
    // corpus subword vocabulary under the greedy encode — the
    // q_bpe_subwords / q_unigram_subwords twin
    "q_wordpiece_encode" -> { (s, d) =>
      graft.operators.WordPiece.subwordVocab(
        graft.operators.Vocab.wordCounts(Tables(s, d).documents))
    },
    // same 1-row fertility report as the BPE and Unigram families, so the
    // three tokenizers compare on one scale
    "q_wordpiece_fertility" -> { (s, d) =>
      graft.operators.WordPiece.fertility(
        graft.operators.Vocab.wordCounts(Tables(s, d).documents))
    },
    // lossless greedy-cover CONTRACT (the q_bpe_roundtrip pattern):
    // stripping ## and concatenating must reproduce every training word
    "q_wordpiece_roundtrip" -> { (s, d) =>
      graft.operators.WordPiece.roundtripReport(
        graft.operators.Vocab.wordCounts(Tables(s, d).documents))
    },
    // per-document token metering under the trained table — the BATCH twin
    // of streaming.StreamTokenize.pieceCounts (stateless projection; runs
    // unchanged on a readStream source, StreamTokenizeSpec wires it live)
    "q_token_meter" -> { (s, d) =>
      val docs = Tables(s, d).documents
      val t = graft.operators.UnigramLm
        .train(s, graft.operators.Vocab.wordCounts(docs))
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      graft.streaming.StreamTokenize.pieceCounts(docs, t)
    },
    // exact heavy hitters at sketch cost: Misra-Gries candidates (O(k)
    // shuffle per partition, any item cardinality) + exact second pass over
    // candidate rows only — the output is deterministic even though the
    // intermediate sketch is not, so the oracle is the plain histogram filter
    "q_heavy_hitters" -> { (s, d) =>
      graft.operators.HeavyHitters
        .heavyHitters(Tables(s, d).documents, Seq("source"), "lang", k = 2)
    },
    "q_value_percentiles" -> { (s, d) =>
      Tables(s, d).events.groupBy(col("event_type")).agg(
        round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.9)"), 6).as("p90")
      )
    },
    // §2.4 breadth: Pearson correlation / sample covariance / stddev per
    // group (rounded — covariance sums are partition-order-sensitive)
    "q_value_correlation" -> { (s, d) =>
      Tables(s, d).lineitem.groupBy(col("l_returnflag")).agg(
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("qty_price_corr"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("qty_price_cov"),
        round(stddev_samp(col("l_extendedprice")), 4).as("price_stddev"),
        count(lit(1)).as("n"))
    },
    // custom TypedImperativeAggregate: bounded-heap top-k with map-side combine
    "q_topk_prices" -> { (s, d) =>
      Tables(s, d).lineitem
        .groupBy(col("l_returnflag"))
        .agg(graft.expressions.TopKAgg.top_k(col("l_extendedprice"), 5).as("topk"))
        .select(col("l_returnflag"), posexplode(col("topk")).as(Seq("pos", "price")))
        .select(col("l_returnflag"), (col("pos") + 1).as("rank"), col("price"))
    },
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
    // sets, the curation diagnostic for choosing/combining detectors
    "q_dedup_method_overlap" -> { (s, d) =>
      val docs = Tables(s, d).documents
      val pairs = graft.operators.SimilarityJoin.jaccardSelfJoin(docs, threshold = 0.6)
      // one subtree, one PPJoin execution: explode both endpoints from a
      // single read of the expensive similarity join (a two-branch union
      // would re-run the prefix-filter join once per branch)
      val pp = pairs
        .select(explode(array(col("id1"), col("id2"))).as("doc_id")).distinct()
        .withColumn("in_pp", lit(true))
      val ss = graft.operators.SubstringDedup.duplicatedSpans(docs, w = 8)
        .select(col("doc_id")).distinct()
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
    // ---- dedup over documents ----
    "q_dedup_exact" -> { (s, d) =>
      Dedup.exactGroups(Tables(s, d).documents).select(
        col("doc_id"), col("text_md5"), col("n_copies"))
    },
    // continuous-ingest admission (operators.IncrementalDedup): corpus =
    // doc_id % 5 <> 0, batch = the rest PLUS planted exact copies (corpus
    // copies at +1M, batch copies at +2M — the fixture has no byte dups,
    // so the plants make every decision class produce rows, the
    // q_cosine_neardup lesson)
    "q_incremental_dedup" -> { (s, d) =>
      val docs = Tables(s, d).documents.select(col("doc_id"), col("text"))
      val corpus = docs.filter(col("doc_id") % 5 =!= 0)
      val batch = docs.filter(col("doc_id") % 5 === 0)
        .unionByName(corpus.filter(col("doc_id") % 11 === 3)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
        .unionByName(docs.filter(col("doc_id") % 5 === 0 && col("doc_id") % 7 === 1)
          .select((col("doc_id") + 2000000L).as("doc_id"), col("text")))
      graft.operators.IncrementalDedup.admit(batch, corpus)
    },
    // cross-document line dedup (operators.LineDedup, the RefinedWeb
    // line-wise correction): the fixture has no newlines, so boilerplate
    // lines are PLANTED deterministically — a "subscribe" footer on every
    // doc_id%3==0, a copyright line on %5==0, and a WITHIN-doc duplicate
    // of the doc's own text on %7==0 (must NOT strip: distinct-doc counts,
    // not occurrence counts, define boilerplate)
    "q_line_stats" -> { (s, d) =>
      graft.operators.LineDedup.frequentLines(
        graft.operators.LineDedup.lines(plantedLineDocs(s, d)), minDocs = 10L)
    },
    "q_line_dedup" -> { (s, d) =>
      graft.operators.LineDedup.stripBoilerplate(plantedLineDocs(s, d), minDocs = 10L)
        .select(col("doc_id"), col("n_lines"), col("n_dropped"),
          md5(col("clean_text")).as("clean_md5"))
    },
    // URL canonicalization (functions.UrlFunctions): tracking-param strip
    // + param sort + case folding collapse byte-distinct URLs naming the
    // same resource — the URL-level first dedup pass of a web corpus.
    // URLs are synthesized deterministically from customer (the fixture
    // has no URL column); the oracle replays the identical literal-split
    // arithmetic in DuckDB.
    "q_url_canon" -> { (s, d) =>
      syntheticUrls(s, d).select(col("c_custkey"), col("url"),
        graft.functions.UrlFunctions.canonicalize(col("url")).as("canon"))
    },
    "q_url_hosts" -> { (s, d) =>
      val canon = syntheticUrls(s, d)
        .select(graft.functions.UrlFunctions.canonicalize(col("url")).as("canon"))
      canon
        .groupBy(graft.functions.UrlFunctions.host(col("canon")).as("host"))
        .agg(count(lit(1)).as("n_urls"), countDistinct(col("canon")).as("n_canonical"))
    },
    // HTML text extraction (functions.HtmlFunctions): script/style subtree
    // drop, tag strip, entity decode, whitespace collapse — the C4-style
    // pre-filter pass. Docs are wrapped in a deterministic HTML shell
    // (the fixture has no HTML column); RE2-safe regexes replay in DuckDB
    "q_html_strip" -> { (s, d) =>
      Tables(s, d).documents.select(col("doc_id"),
        graft.functions.HtmlFunctions.stripTags(
          syntheticHtml(col("text"), col("doc_id"))).as("clean"))
    },
    // anchor-href harvest composed with the URL canonicalizer — the link
    // extraction feeding a crawl frontier / URL-dedup pass
    "q_html_links" -> { (s, d) =>
      Tables(s, d).documents
        .select(col("doc_id"),
          posexplode(graft.functions.HtmlFunctions.anchorHrefs(
              syntheticHtml(col("text"), col("doc_id"))))
            .as(Seq("link_idx", "href")))
        .select(col("doc_id"), (col("link_idx") + 1).as("link_idx"), col("href"),
          graft.functions.UrlFunctions.canonicalize(col("href")).as("canon"),
          graft.functions.UrlFunctions.host(col("href")).as("host"))
    },
    "q_jaccard_adjacent" -> { (s, d) =>
      val docs = Tables(s, d).documents
        .select(col("doc_id"), array_distinct(TF.tokens(col("text"))).as("words"))
      val a = docs.select(col("doc_id").as("id1"), col("words").as("w1"))
      val b = docs.select((col("doc_id") - 1).as("id1"), col("doc_id").as("id2"),
        col("words").as("w2"))
      a.join(b, Seq("id1")).select(col("id1"), col("id2"),
        Dedup.jaccard(col("w1"), col("w2")).as("jaccard"))
    },
    // LSH banding tuner (MMDS §3.4): the S-curve p(s) = 1 − (1 − s^r)^b
    // for every (bands, rows) split of 16 lanes, evaluated against THIS
    // corpus's observed similarity sample (the adjacent-id pair sample
    // above — a defined, oracled sample) — expected detections and
    // expected misses above τ = 0.5 per configuration. Powers are
    // UNROLLED multiplication chains (never libm pow), per-pair e6
    // quantization before exact BIGINT sums
    "q_lsh_tuning" -> { (s, d) =>
      val docs = Tables(s, d).documents
        .select(col("doc_id"), array_distinct(TF.tokens(col("text"))).as("words"))
      val a = docs.select(col("doc_id").as("id1"), col("words").as("w1"))
      val b = docs.select((col("doc_id") - 1).as("id1"), col("doc_id").as("id2"),
        col("words").as("w2"))
      val sims = a.join(b, Seq("id1"))
        .select(Dedup.jaccard(col("w1"), col("w2")).as("j"))
      def pw(x: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column =
        (1 until n).foldLeft(x)((acc, _) => acc * x)
      val grid = Seq((1, 16), (2, 8), (4, 4), (8, 2), (16, 1))
      val scored = grid.map { case (bands, rows) =>
        val p = lit(1.0d) - pw(lit(1.0d) - pw(col("j"), rows), bands)
        val pE6 = floor(p * lit(1000000.0d) + lit(0.5d)).cast("long")
        sims.agg(
          count(lit(1)).as("n_pairs"),
          sum(pE6).as("exp_detected_e6"),
          sum(when(col("j") >= lit(0.5d), lit(1000000L) - pE6).otherwise(0L))
            .as("exp_missed_above_tau_e6"))
          .select(lit(bands).as("bands"), lit(rows).as("rows"),
            col("n_pairs"), col("exp_detected_e6"), col("exp_missed_above_tau_e6"))
      }
      scored.reduce(_ unionByName _)
    },
    // oracle for the minhashPairs VERIFY stage: the same shingle + exact-
    // Jaccard kernels, but over a deterministic candidate set (doc_id
    // distance ≤ 5) so DuckDB can hash-match what LSH bucketing (engine-
    // specific) cannot. Spelled as explode(offsets) + equi-join — the
    // shape that scales — not a range join.
    "q_neardup_verify" -> { (s, d) =>
      val docs = Tables(s, d).documents
        .select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
      val cand = docs
        .select(col("doc_id").as("id1"), col("sh").as("sh1"),
          explode(sequence(lit(1L), lit(5L))).as("off"))
        .withColumn("id2", col("id1") + col("off"))
      cand
        .join(docs.select(col("doc_id").as("id2"), col("sh").as("sh2")), Seq("id2"))
        .select(col("id1"), col("id2"), Dedup.jaccard(col("sh1"), col("sh2")).as("jaccard"))
    },
    // duplicate GROUPS from pairwise matches: shingle posting lists (hot
    // shingles capped — the LSH maxBucketSize economics) → pairs sharing
    // ≥5 shingles → connected components by iterative min-label
    // propagation (operators.Components); every doc gets its component's
    // min doc_id, isolated docs their own. Deterministic end-to-end, so
    // the whole graph pipeline — including transitivity — is oracled via
    // a recursive CTE.
    // deterministic synchronous LPA communities over the near-dup graph
    // (operators.LabelPropagation): 3 fixed rounds, most-frequent-neighbor
    // label with smallest-label ties — the finer-than-components split
    "q_lpa_communities" -> { (s, d) =>
      graft.operators.LabelPropagation.communities(
        shingleEdges(Tables(s, d).documents))
    },
    // per-community dedup quality (operators.CommunityQuality): exact
    // capped-pair intra-community Jaccard over the LPA communities — the
    // audit that separates real duplicate families from bridge artifacts;
    // md5-rank cap bounds the pair fan-out by construction
    "q_community_quality" -> { (s, d) =>
      val docs = Tables(s, d).documents
      graft.operators.CommunityQuality.intraJaccard(
        docs,
        graft.operators.LabelPropagation.communities(shingleEdges(docs)))
    },
    "q_dedup_components" -> { (s, d) =>
      val docs = Tables(s, d).documents
      docs.select(col("doc_id"))
        .join(Components.connectedComponents(shingleEdges(docs)),
          col("node") === col("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("component"), col("doc_id")).as("component"))
    },
    // dup-multiplicity distribution: how many clusters of each size — the
    // standard dedup report (a fat tail = boilerplate families; the
    // singleton count = the corpus that survives keep-one untouched)
    "q_dup_cluster_sizes" -> { (s, d) =>
      val docs = Tables(s, d).documents
      docs.select(col("doc_id"))
        .join(Components.connectedComponents(shingleEdges(docs)),
          col("node") === col("doc_id"), "left")
        .select(coalesce(col("component"), col("doc_id")).as("component"))
        .groupBy(col("component")).agg(count(lit(1)).as("cluster_size"))
        .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))
    },
    // Flesch–Kincaid readability (the classic text-quality feature):
    // sentences = terminator runs (floor 1), syllables = per-word vowel
    // groups (floor 1) — exact integer counts, ONE replayed double chain
    "q_readability" -> { (s, d) =>
      val toks = TF.tokens(col("text"))
      val sentences = greatest(lit(1L),
        size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0))).cast("long"))
      val syllables = aggregate(
        transform(toks, w =>
          greatest(lit(1L), size(regexp_extract_all(w, lit("[aeiouy]+"), lit(0))).cast("long"))),
        lit(0L), (a, x) => a + x)
      val words = size(toks).cast("long")
      Tables(s, d).documents
        .select(col("doc_id"), words.as("n_words"), sentences.as("n_sentences"),
          syllables.as("n_syllables"))
        .withColumn("fk_e6",
          when(col("n_words") === 0L, 0L).otherwise(
            floor((lit(0.39d) * col("n_words").cast("double") / col("n_sentences").cast("double")
              + lit(11.8d) * col("n_syllables").cast("double") / col("n_words").cast("double")
              - lit(15.59d)) * lit(1000000.0d) + lit(0.5d)).cast("long")))
    },
    // the deduplicated corpus itself: one canonical doc per near-dup
    // group (the group's min id), isolated docs kept — what a corpus
    // build consumes after the grouping step
    "q_dedup_keep" -> { (s, d) =>
      val docs = Tables(s, d).documents
      Components.keepCanonical(
        docs.select(col("doc_id"), col("source"), col("lang")),
        shingleEdges(docs))
    },
    // quality-policy canonicalization: keep the LONGEST doc per near-dup
    // cluster (ties → smaller id) — deterministic, so the survivor set
    // hash-matches the recursive-CTE oracle
    "q_dedup_keep_best" -> { (s, d) =>
      val docs = Tables(s, d).documents
      Components.keepBest(
        docs.select(col("doc_id"), col("n_chars")), shingleEdges(docs))
        .select(col("doc_id"), col("component"), col("n_chars"))
    },
    "q_minhash_pairs" -> { (s, d) =>
      Dedup.minhashPairs(Tables(s, d).documents, threshold = 0.05)
        .orderBy(col("jaccard").desc, col("id1"), col("id2")).limit(100)
    },
    "q_simhash_sigs" -> { (s, d) =>
      Tables(s, d).documents.select(col("doc_id"), Dedup.simhash(col("text")).as("simhash"))
    },
    // portable md5-48 SimHash twin (TF.simhash48FromHashes): the
    // q_fingerprints_md5 pattern applied to the SimHash sketch — exact
    // signature oracled, xxhash64 kernel stays the intra-Spark default
    "q_simhash_md5" -> { (s, d) =>
      Tables(s, d).documents
        .select(col("doc_id"), TF.md548Tokens(col("text")).as("_hs"))
        .select(col("doc_id"), TF.simhash48FromHashes(col("_hs")).as("simhash48"))
    },
    // portable md5-48 MinHash twin (TF.minhash48Lanes): lane-salted md5
    // minima over distinct 3-shingles — the sketch trilogy's third member
    // native one-pass kernel (expressions.Md5MinHash): all 16 lane minima
    // in a single shingle traversal on raw digest bytes — bit-identical to
    // the HOF spelling (MinhashPortableSpec pins kernel ≡ HOF ≡ java-MD5)
    "q_minhash_md5_sigs" -> { (s, d) =>
      val arr = graft.expressions.Md5MinHash.lanes(
        TF.shingles3(TF.tokens(col("text"))), 16)
      Tables(s, d).documents
        .select(col("doc_id"), arr.as("_mh"))
        .select(col("doc_id") +:
          (0 until 16).map(i => element_at(col("_mh"), i + 1).as(s"mh$i")): _*)
    },
    "q_simhash_pairs" -> { (s, d) =>
      Dedup.simhashPairs(Tables(s, d).documents, maxHamming = 16)
        .orderBy(col("hamming"), col("id1"), col("id2")).limit(100)
    },
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
    // ---- multimodal binary-column plumbing (decode step stubbed) ----
    "q_media_meta" -> { (s, d) =>
      Multimodal.mediaMeta(Multimodal.toMediaTable(Tables(s, d).documents))
    },
    // REAL mp4 container metadata via the ISO BMFF box walker: the video
    // rows' fixtures are minimal-but-real mp4 byte streams synthesized
    // from (doc_id, n_chars) — ftyp/moov/mvhd/tkhd boxes the parser must
    // WALK to recover brand/timescale/duration/dimensions; odd doc_ids
    // are truncated mid-ftyp and must come back ok=false with null
    // metadata (bounds-check proof). The oracle predicts both outcomes
    // from the synthesis formulas — a byte-replay twin.
    "q_media_mp4_meta" -> { (s, d) =>
      import s.implicits._
      val vids = Tables(s, d).documents
        .filter(pmod(col("doc_id"), lit(3)) === 2)
        .select(col("doc_id").cast("long"), col("n_chars").cast("long"))
        .as[(Long, Long)]
      val media = vids.map { case (id, nc) =>
        val full = Multimodal.synthMp4(
          brand = "mp42",
          timescale = 600 + (id % 5) * 100,
          duration = nc * 100,
          width = (160 + (id % 32) * 8).toInt,
          height = (90 + (id % 18) * 16).toInt)
        (id, if (id % 2 == 1) full.take(20) else full)
      }.toDF("doc_id", "content")
      Multimodal.mp4Meta(media)
    },
    // REAL video FRAME DECODE, codec-free (operators.Avi): RIFF
    // hdrl/strl/movi walk + uncompressed-DIB bottom-up stride-padded
    // BGR24 frame grids. Fixtures are formula-synthesized real AVIs
    // (odd widths ⇒ 3 pad bytes per row on every file); odd doc_ids are
    // truncated mid-header and must come back ok=false with null
    // metadata (bounds-check proof). Oracles predict both outcomes from
    // the synthesis formulas — byte-replay twins.
    "q_media_avi_meta" -> { (s, d) => Avi.aviMeta(aviFixture(s, d)) },
    // per decoded frame: exact-integer pixel sum + x/y moments — the
    // moments flip under a stride or bottom-up mistake (a plain sum is
    // orientation-invariant), so the oracle pins the DECODE, not just
    // the walk; corrupt rows contribute no frames
    "q_media_avi_frames" -> { (s, d) => Avi.frameStats(aviFixture(s, d)) },
    "q_media_features" -> { (s, d) =>
      val feats = Multimodal.extractFeatures(Multimodal.toMediaTable(Tables(s, d).documents))
      feats.select(col("doc_id"), col("media_type"), col("n_bytes"),
        round(element_at(col("features"), 1).cast("double"), 6).as("f0"))
    },
    "q_media_frames" -> { (s, d) =>
      Multimodal.sampleFrames(Multimodal.toMediaTable(Tables(s, d).documents))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_frames"))
    },
    // the image RESIZE plumbing oracled through a lossless round-trip:
    // 4×4 gray image from the first 16 content bytes → real PNG encode →
    // real ImageIO decode → nearest-neighbor 2×2 resize → the four samples
    // must equal bytes 0/2/8/10 exactly (PNG is lossless), so the DuckDB
    // hex replay checks the actual codec + resample per row
    "q_media_resize" -> { (s, d) =>
      Multimodal.resizeSample(Multimodal.toMediaTable(Tables(s, d).documents))
    },
    // dHash perceptual-hash bands per media row (8×9 block grid → 64
    // difference bits → 4×16-bit bands). Image rows dispatch to the real
    // javax.imageio pixel dHash (MultimodalSpec); the driver tables'
    // stand-in bytes fall back to the byte-fold grid, which the oracle
    // replays exactly from the hex dump — all-integer arithmetic
    "q_media_phash" -> { (s, d) =>
      Multimodal.phash(Multimodal.toMediaTable(Tables(s, d).documents))
        .select(col("doc_id"), col("media_type"),
          posexplode(col("bands")).as(Seq("band_idx", "band_val")))
    },
    // perceptual near-dup pairs by pigeonhole banding (the simhashPairs
    // shape on media): planted 1-byte-perturbed twins under negated ids
    // (multiples of 3 only, so pmod/% agree on the media_type dispatch)
    // land within Hamming 2 of their originals — the pairs output proves
    // band-bucket candidates + exact verification end to end
    "q_media_phash_neardup" -> { (s, d) =>
      val docs = Tables(s, d).documents.select(col("doc_id"), col("text"))
      val planted = docs.filter(col("doc_id").isin(3, 6, 9))
        .select((-col("doc_id")).as("doc_id"), concat(col("text"), lit("!")).as("text"))
      Multimodal.phashNearDupPairs(Multimodal.toMediaTable(docs.unionByName(planted)))
    },
    // UniMax budget allocation (operators.Unimax): the epoch-capped
    // uniform mixture — one epoch's worth of total chars distributed as
    // uniformly as the 2-epoch caps allow. The waterfill's closed
    // relational form (capped set is a prefix of the cap-ascending order)
    // makes the whole allocation exact BIGINT window arithmetic. The
    // budget probe is a 1-row bounded collect.
    "q_unimax_alloc" -> { (s, d) =>
      val docs = Tables(s, d).documents
      val total = docs.agg(sum(col("n_chars").cast("long"))).collect()(0).getLong(0)
      graft.operators.Unimax.allocate(docs, budget = total, maxEpochs = 2)
    },
    // ---- winnowing fingerprints (MOSS) — position-aware local dedup ----
    // per-doc fingerprint profile over the whole corpus: count, distinct
    // hashes, checksum — the compact audit of the persisted fingerprint
    // table (full fingerprints oracled on the subset below)
    "q_winnow_stats" -> { (s, d) =>
      graft.operators.Winnow.fingerprints(Tables(s, d).documents)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_fps"),
          countDistinct(col("fp_hash")).as("n_hashes"),
          sum(col("fp_hash")).as("fp_sum"))
    },
    // full (hash, position) fingerprints for the doc_id<50 subset — every
    // selected window minimum hash-matched against the SQL replay
    "q_winnow_fp_subset" -> { (s, d) =>
      graft.operators.Winnow.fingerprints(Tables(s, d).documents.filter(col("doc_id") < 50))
    },
    // candidate pairs by shared fingerprint hashes: planted 200-char prefix
    // copies under negated ids share a long normalized run, so the
    // winnowing guarantee (>=1 shared fingerprint per >= w+k-1 = 12 shared
    // chars) makes their recovery structural, not probabilistic
    "q_winnow_pairs" -> { (s, d) =>
      val docs = Tables(s, d).documents.select(col("doc_id"), col("text"))
      val planted = docs.filter(col("doc_id").isin(2, 5, 8))
        .select((-col("doc_id")).as("doc_id"), substring(col("text"), 1, 200).as("text"))
      graft.operators.Winnow.candidatePairs(
        graft.operators.Winnow.fingerprints(docs.unionByName(planted)))
    },
    // ---- series analytics, concentration, segmentation, clustering ----
    // Replayable k-means (operators.KMeansReplay): clustering moved OUT of
    // the RNG/rows-only MLlib class into a full hash oracle — integer-micros
    // coordinates make every distance an exact BIGINT, seeds are md5-ranked,
    // centers are floor(S/n + 0.5) integer division, 3 fixed Lloyd rounds.
    // The generated oracle (KMeansOracleSql) replays every round.
    "q_kmeans_clusters" -> { (s, d) =>
      KMeansReplay.clusterStats(s, Tables(s, d).embeddings, "embedding", 64, 8, 3)
    },
    // clustering evaluation (operators.ClusterEval): ARI + purity of the
    // replayable k-means assignments against the embedding labels
    "q_cluster_ari" -> { (s, d) =>
      val emb = Tables(s, d).embeddings
      graft.operators.ClusterEval.ariPurity(
        KMeansReplay.assignments(s, emb, "embedding", 64, 8, 3),
        emb.select(col("vec_id"), col("label")))
    },
    // NMI of the same k-means assignments vs labels (operators.ClusterEval):
    // same exact contingency table as the ARI; ln terms quantized to
    // integer micros BEFORE the order-free BIGINT sums (the q_rrf_fusion
    // ln discipline), one replayed float normalization, floor-6
    "q_cluster_nmi" -> { (s, d) =>
      val emb = Tables(s, d).embeddings
      graft.operators.ClusterEval.nmi(
        KMeansReplay.assignments(s, emb, "embedding", 64, 8, 3),
        emb.select(col("vec_id"), col("label")))
    },
    // greedy k-center coreset (operators.KCenter, Gonzalez 1985): 8
    // maximally-spread embeddings — md5-min start, farthest-point rounds
    // on exact BIGINT distances, nearest-center assignment for every point
    "q_kcenter_coreset" -> { (s, d) =>
      graft.operators.KCenter.greedyCoreset(s, Tables(s, d).embeddings)
    },
    // maximal marginal relevance vs probe vec_id 0 (operators.Mmr):
    // λ=7/10 as integer coefficients over exact BIGINT micro dot products
    // — relevance-vs-redundancy greedy, trajectory replayed per-round
    "q_mmr_selection" -> { (s, d) =>
      graft.operators.Mmr.select(s, Tables(s, d).embeddings, queryId = 0L, k = 8)
    },
    // RAG context packing (operators.ContextPack): the MMR trajectory
    // joined to exact token counts, packed greedily until the 120-token
    // budget — the longest prefix of the selection order that fits.
    // Oracle replays the shared MmrCtes trajectory + BIGINT prefix sum.
    "q_context_pack" -> { (s, d) =>
      graft.operators.ContextPack.pack(s, Tables(s, d).embeddings,
        Tables(s, d).documents, queryId = 0L, k = 8, budget = 120L)
    },
    // Replayable GMM soft clustering (operators.GmmReplay): fixed-round
    // spherical EM whose exp() is the 16-squaring pseudo-exp kernel — pure
    // IEEE ·/+ both engines replay bit-for-bit; responsibilities integer
    // micros, M-step exact BIGINT sums. Generated oracle (GmmOracleSql)
    // replays both EM rounds and the final E-step.
    // σ² = 0.05: x = −d²/(2σ²·10¹²) then spans ≈ [−28, −16] on this
    // corpus (measured) — discriminating responsibilities without hitting
    // the −30 clamp; the default 0.25 concentrates every pair near
    // uniform (high-dim distance concentration).
    "q_gmm_soft" -> { (s, d) =>
      GmmReplay.softAssignments(s, Tables(s, d).embeddings, "embedding", 64, 8, 2,
        sigmaSq = 0.05d)
    },
    // Gini of per-user purchase spend (operators.Concentration): exact
    // integer micros + rank formula; the one double expression replays.
    "q_spend_gini" -> ((s, d) => Concentration.spendGini(Tables(s, d).events)),
    // best single mean-shift split of the hourly series — prefix sums over
    // exact integer counts; even the float argmax agrees bit-for-bit
    "q_changepoint" -> ((s, d) => Changepoint.bestMeanShift(Tables(s, d).events)),
    // ACF lags 1..6 of the zero-filled hourly series from exact integer
    // sufficient statistics only (no float ever aggregated)
    "q_acf_hourly" -> ((s, d) => Autocorrelation.hourlyAcf(Tables(s, d).events, 6)),
    // RFM quartile segmentation — deterministic ntile(4) under a total
    // (metric, user_id) order; money via the integer-micros accumulator
    "q_rfm_segments" -> ((s, d) => Rfm.segments(Tables(s, d).events)),
    // linear multi-touch attribution (operators.Attribution): equal split
    // of purchase value across the 24h preceding views — integer micros
    // credit via floor division (remainder drops identically both engines)
    "q_linear_attribution" -> ((s, d) => Attribution.linearByHour(Tables(s, d).events)),
    // deterministic A/B lift + pooled two-proportion z (operators.AbTest):
    // md5-48 arm assignment, one replayed double expression for lift/z
    "q_ab_lift" -> ((s, d) => AbTest.conversionLift(Tables(s, d).events)),
    // always-valid sequential A/B (operators.Msprt): the daily-peek mixture
    // SPRT next to the fixed-horizon z above — log-space only (exp never
    // computed), per-look e6 quantization before the integer running max
    "q_msprt_lift" -> ((s, d) => graft.operators.Msprt.sequentialLift(Tables(s, d).events)),
    // HHI deciles of per-user event-type mix (operators.Diversity): one
    // division of two exact integers per user, integer-only report
    "q_hhi_buckets" -> ((s, d) => Diversity.hhiBuckets(Tables(s, d).events)),
    // bigram PMI collocations (operators.Collocations): exact counts, ln
    // replayed (TfIdf/BM25 precedent), min support 5
    "q_pmi_bigrams" -> ((s, d) => Collocations.pmiBigrams(Tables(s, d).documents)),
    // event-type trigram paths (operators.Paths): the 3-gram extension of
    // the Markov operator — one user exchange serves both leads
    "q_event_trigrams" -> ((s, d) => Paths.eventTrigrams(Tables(s, d).events)),
    // Fano factor per type over the dense global hour grid — burstiness
    "q_fano_factor" -> ((s, d) => Dispersion.fanoByType(Tables(s, d).events)),
    // integer-replay EWMA (operators.Ewma): exact BIGINT recurrence
    // s += floor((10⁶x − s)/2³) over each type's dense daily counts —
    // sequential state hash-oracled via a recursive-CTE replay
    "q_ewma_daily" -> ((s, d) => graft.operators.Ewma.bucketEwma(Tables(s, d).events)),
    // market-basket lift on the type vocabulary (distinct-user incidence)
    "q_event_type_lift" -> ((s, d) => Association.typeLift(Tables(s, d).events)),
    // Mann–Whitney U weekend-vs-weekday purchase values, tie-corrected z;
    // doubled average ranks keep every rank sum an exact BIGINT
    "q_rank_sum_test" -> ((s, d) => RankTest.weekendRankSum(Tables(s, d).events)),
    // daily churn ledger (operators.Churn): one user exchange for both
    // lag and lead; deterministic first/last-day edges
    "q_daily_churn" -> ((s, d) => Churn.dailyLedger(Tables(s, d).events)),
    // gaps-and-islands longest-streak histogram (operators.Streaks)
    "q_user_streaks" -> ((s, d) => Streaks.maxStreakHistogram(Tables(s, d).events)),
    // Pareto curve: top-p% users' revenue share at standard cutoffs
    "q_revenue_pareto" -> ((s, d) => Pareto.revenueShares(s, Tables(s, d).events)),
    // per-source n_chars decile profile — the mixture batch-effect check
    "q_source_deciles" -> ((s, d) => SourceProfile.decileProfile(Tables(s, d).documents)),
    // the mapping half of the curation story (q_source_deciles is the
    // summary half): per-doc cross-source quantile normalization onto the
    // pooled n_chars distribution — histogram ranks, integer bracket math,
    // one replayed IEEE interpolation (operators.QuantileNormalize)
    "q_quantile_normalize" -> { (s, d) =>
      QuantileNormalize.toPooled(Tables(s, d).documents)
    },
    // Gopher hard quality gates (operators.GopherFilter, Rae 2021 A1.1):
    // every gate an INTEGER comparison (thresholds cross-multiplied), so
    // the whole filter battery hash-oracles with no rounding anywhere
    "q_gopher_gates" -> ((s, d) => GopherFilter.gates(Tables(s, d).documents)),
    // DSIR importance selection (operators.Dsir, Xie 2023): en-lang target
    // domain, md5-48 hashed unigram+bigram buckets, integer-micro λ per
    // bucket, exact BIGINT per-doc scores, PrefixSum distributed top-25%
    "q_dsir_scores" -> { (s, d) =>
      Dsir.importanceScores(Tables(s, d).documents, col("lang") === "en")
    },
    // corpus duplication profile (SubstringDedup.dupNgramStats — Lee
    // 2021's headline metric): per-source fraction of 8-gram positions
    // duplicated anywhere in the corpus; aggregated-hash-table join only
    // corpus diversity: distinct-n ratios per source (the text-generation
    // diversity metric — unique n-grams / total n-grams, n = 1..3); a
    // collapsing ratio flags template/boilerplate-heavy sources before
    // they flood training batches. Exact integers + one DIV per cell
    "q_distinct_ngrams" -> { (s, d) =>
      val toks = Tables(s, d).documents
        .select(col("source"), TF.tokens(col("text")).as("t"))
      val t = col("t")
      val b2 = graft.operators.Repetition.bigrams(t)
      val g3 = zip_with(
        slice(b2, lit(1), greatest(size(t) - 2, lit(0))),
        slice(t, lit(3), greatest(size(t) - 2, lit(0))),
        (a, b) => concat(a, lit(" "), b))
      val uni = toks.select(col("source"), lit(1).as("n"), explode(t).as("g"))
      val bi = toks.select(col("source"), lit(2).as("n"), explode(b2).as("g"))
      val tri = toks.select(col("source"), lit(3).as("n"), explode(g3).as("g"))
      uni.unionByName(bi).unionByName(tri)
        .groupBy(col("source"), col("n"))
        .agg(count(lit(1)).as("n_total"), countDistinct(col("g")).as("n_unique"))
        .select(col("source"), col("n"), col("n_total"), col("n_unique"),
          expr("n_unique * 1000000 DIV n_total").as("distinct_ratio_e6"))
    },
    "q_dup_ngram_stats" -> { (s, d) =>
      graft.operators.SubstringDedup.dupNgramStats(Tables(s, d).documents, w = 8)
    },
    // length-bucketed batching padding report (operators.Batching): the
    // dynamic-batching waste comparison — all-integer until one replayed
    // floor-6 division; ranks via the distributed PrefixSum
    "q_batch_padding" -> { (s, d) =>
      graft.operators.Batching.paddingReport(Tables(s, d).documents, m = 32)
    },
    // optimal length-bucket boundaries (operators.LengthBuckets): the
    // bucket_by_sequence_length design problem solved exactly — O(B·L²)
    // DP over the bounded length histogram, every cell an exact BIGINT,
    // boundaries backtracked with ties to the smallest split
    "q_length_buckets" -> { (s, d) =>
      graft.operators.LengthBuckets.optimalBuckets(Tables(s, d).documents, b = 4)
    },
    // Gopher A1.2 repetition gates (operators.RepetitionCoverage): char
    // coverage of top 2..4-grams and duplicated 5..10-grams, one
    // zero-shuffle HOF projection; gates are cross-multiplied integers,
    // fractions one replayed floor-6 division each
    "q_gopher_repetition" -> { (s, d) =>
      RepetitionCoverage.gates(Tables(s, d).documents)
    },
    // CUPED variance-reduced lift (operators.Cuped): pre-period spend as
    // the covariate; arm means of the adjusted outcome expand to pure
    // integer sufficient statistics — no per-user float ever aggregated
    "q_cuped_lift" -> ((s, d) => Cuped.adjustedLift(Tables(s, d).events)),
    // Haar wavelet energy by scale (operators.Wavelet): unnormalized
    // integer cascade, exact BIGINT energies
    "q_wavelet_energy" -> ((s, d) => Wavelet.hourlyEnergy(Tables(s, d).events)),
    // hour-of-week traffic matrix (operators.Tempo): epoch-day dow
    // arithmetic; share is one replayed division
    "q_hour_of_week" -> ((s, d) => Tempo.hourOfWeekProfile(Tables(s, d).events)),
    // inter-purchase gap histogram — exact micros lags, floor-hour buckets
    "q_repurchase_gaps" -> ((s, d) => Tempo.repurchaseGaps(Tables(s, d).events)),
    // ---- ML plane (RNG/ML — rows-only checks, properties in ScalaTest) ----
    // HASH-ORACLED since r18 over the deterministic md5-order twin: the
    // balanced distribution is exactly (label, minority_count) per class —
    // the oracle states that identity directly. The Bernoulli sampleBy
    // path (Undersample.balance) stays spec-covered (ratio property in
    // UndersampleSpec): engine-RNG membership can only ever get rows-only.
    "q_balanced_label_dist" -> { (s, d) =>
      Undersample.balanceDeterministic(
          sessionFeatures(s, d).select(col("user_session"), col("label")))
        .groupBy(col("label")).agg(count(lit(1)).as("n"))
    },
    // deterministic twin of the RNG undersample: exactly the minority count
    // kept per class in md5(id) order — full kept MEMBERSHIP hash-matched
    // (the seeded sampleBy above can only ever get a rows-only check)
    "q_balanced_deterministic" -> { (s, d) =>
      Undersample.balanceDeterministic(
        sessionFeatures(s, d).select(col("user_session"), col("label")))
        .select(col("user_session"), col("label"), col("bal_rank"))
    },
    "q_rf_metrics" -> { (s, d) =>
      val (_, m) = IntentModel.trainEval(sessionFeatures(s, d))
      s.createDataFrame(Seq((m.auc, m.accuracy, m.f1, m.weightedRecall)))
        .toDF("auc", "accuracy", "f1", "weighted_recall")
    },
    "q_als_recs" -> { (s, d) =>
      val inter = Recommender.interactions(
        clickstream(s, d).withColumn("user_session", split(col("user_session"), "_").getItem(0)))
      val model = Recommender.train(inter, maxIter = 5)
      Recommender.recommend(model, 5)
        .select(col("user"), posexplode(col("recommendations.item")).as(Seq("rank", "item")))
    }
  )

  def oracleSql: Map[String, String] = Map(
    "q_funnel_quantiles" -> FunnelQuantilesSql,
    "q_markov_stationary" -> MarkovStationarySql,
    "q_pca_two_components" -> PcaTwoOracleSql,
    "q_kcore" -> KCoreOracleSql,
    "q_lpa_communities" -> LpaOracleSql,
    // per-community capped-pair Jaccard: NESTS the LPA oracle (derived
    // table) so the community contract cannot drift; md5-48 rank cap,
    // per-pair e6 quantization before the exact BIGINT sums
    "q_community_quality" ->
      s"""WITH lpa AS (SELECT * FROM ($LpaOracleSql) lz),
         |t AS (SELECT doc_id, $TokensSql AS toks FROM documents),
         |d AS (
         |  SELECT doc_id, list_distinct(
         |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
         |         ELSE list_transform(generate_series(1, len(toks) - 2),
         |                             i -> array_to_string(toks[i:i+2], ' '))
         |    END) AS sh
         |  FROM t),
         |mem AS (
         |  SELECT lpa.community, lpa.node AS doc_id, d.sh
         |  FROM lpa JOIN d ON d.doc_id = lpa.node),
         |cap AS (
         |  SELECT community, doc_id, sh FROM (
         |    SELECT mem.*, row_number() OVER (PARTITION BY community
         |      ORDER BY ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT,
         |               doc_id) AS rn
         |    FROM mem) z
         |  WHERE rn <= 8),
         |pr AS (
         |  SELECT a.community,
         |    CAST(floor(
         |      CASE WHEN len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) = 0
         |           THEN 0.0
         |           ELSE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |                / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
         |      END * 1000000.0 + 0.5) AS BIGINT) AS j_e6
         |  FROM cap a JOIN cap b
         |    ON a.community = b.community AND b.doc_id > a.doc_id),
         |sz AS (SELECT community, count(*) AS n_members FROM lpa GROUP BY community),
         |sp AS (SELECT community, count(*) AS n_sampled FROM cap GROUP BY community),
         |ag AS (
         |  SELECT community, count(*) AS n_pairs,
         |         CAST(sum(j_e6) AS BIGINT) AS sum_j_e6, min(j_e6) AS min_j_e6
         |  FROM pr GROUP BY community)
         |SELECT ag.community, sz.n_members, sp.n_sampled, ag.n_pairs,
         |       ag.sum_j_e6, ag.min_j_e6,
         |       floor(CAST(ag.sum_j_e6 AS DOUBLE) / CAST(ag.n_pairs AS DOUBLE)
         |             / 1000000.0 * 1000000.0 + 0.5) / 1000000.0 AS mean_jaccard
         |FROM ag JOIN sz USING (community) JOIN sp USING (community)""".stripMargin,
    "q_session_features" -> s"$FeaturesSql SELECT * FROM features",
    "q_session_features_join" -> s"$FeaturesSql SELECT * FROM features",
    "q_first_purchase" ->
      """SELECT CAST(user_id AS VARCHAR) || '_' || strftime(ts, '%Y-%m-%d') AS user_session,
        |       CAST(floor(epoch(min(ts))) AS BIGINT) AS first_purchase_s
        |FROM events WHERE event_type = 'purchase' GROUP BY 1""".stripMargin,
    "q_event_type_dist" ->
      "SELECT event_type, count(*) AS n FROM events GROUP BY event_type",
    "q_null_counts" ->
      """SELECT count(CASE WHEN event_type IS NULL THEN 1 END) AS event_type_nulls,
        |       count(CASE WHEN value IS NULL THEN 1 END) AS value_nulls,
        |       count(CASE WHEN props IS NULL THEN 1 END) AS props_nulls,
        |       count(CASE WHEN user_id IS NULL THEN 1 END) AS user_id_nulls
        |FROM events""".stripMargin,
    "q_purchase_users_distinct" ->
      "SELECT count(DISTINCT user_id) AS n_purchase_users FROM events WHERE event_type = 'purchase'",
    "q_label_dist" ->
      s"$FeaturesSql SELECT label, count(*) AS n FROM features GROUP BY label",
    "q_balanced_label_dist" ->
      s"""$FeaturesSql
         |SELECT label, CAST(min(n) OVER () AS BIGINT) AS n
         |FROM (SELECT label, count(*) AS n FROM features GROUP BY label) t""".stripMargin,
    "q_balanced_deterministic" ->
      s"""$FeaturesSql, r AS (
         |  SELECT user_session, label,
         |         row_number() OVER (PARTITION BY label
         |                            ORDER BY md5(CAST(user_session AS VARCHAR)),
         |                                     user_session) AS bal_rank
         |  FROM features),
         |m AS (SELECT min(n) AS min_n
         |      FROM (SELECT count(*) AS n FROM features GROUP BY label))
         |SELECT user_session, label, CAST(bal_rank AS BIGINT) AS bal_rank
         |FROM r, m WHERE bal_rank <= min_n""".stripMargin,
    "q_value_describe" ->
      """SELECT event_type, count(value) AS cnt, round(avg(value), 6) AS mean,
        |       round(stddev_samp(value), 6) AS std, min(value) AS min_v, max(value) AS max_v
        |FROM events GROUP BY event_type""".stripMargin,
    "q_conversion_totals" ->
      """SELECT count(CASE WHEN event_type = 'view' THEN 1 END) AS total_views,
        |       count(CASE WHEN event_type = 'click' THEN 1 END) AS total_carts,
        |       count(CASE WHEN event_type = 'purchase' THEN 1 END) AS total_purchases,
        |       count(*) AS total_events,
        |       count(DISTINCT CAST(user_id AS VARCHAR) || '_' || strftime(ts, '%Y-%m-%d'))
        |         AS active_sessions,
        |       CASE WHEN count(CASE WHEN event_type = 'click' THEN 1 END) = 0 THEN 0.0
        |            ELSE CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS DOUBLE)
        |                 / count(CASE WHEN event_type = 'click' THEN 1 END) * 100.0
        |       END AS conversion_rate
        |FROM events""".stripMargin,
    // serving-plane replay twins: hour buckets of event time are the
    // deterministic batch ids; conversion rate is the single exact-integer
    // division; "timestamp" is the bucket start ISO-UTC (make_timestamp
    // takes naive-UTC micros, matching the JVM's ZoneOffset.UTC format)
    "q_metrics_series" ->
      """WITH b AS (
        |  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS batch_id,
        |         count(CASE WHEN event_type = 'click' THEN 1 END) AS total_carts,
        |         count(CASE WHEN event_type = 'purchase' THEN 1 END) AS total_purchases
        |  FROM events GROUP BY 1)
        |SELECT batch_id,
        |       strftime(make_timestamp(batch_id * 3600 * 1000000),
        |                '%Y-%m-%dT%H:%M:%S') AS "timestamp",
        |       CASE WHEN total_carts = 0 THEN 0.0
        |            ELSE CAST(total_purchases AS DOUBLE) / total_carts * 100.0
        |       END AS conversion_rate
        |FROM b ORDER BY batch_id DESC LIMIT 50""".stripMargin,
    // last-10 batches = the 10 largest PRESENT hour buckets (rank, not a
    // calendar cutoff — empty hours never entered the history)
    "q_metrics_eventdist" ->
      """WITH b AS (
        |  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS batch_id,
        |         count(CASE WHEN event_type = 'view' THEN 1 END) AS total_views,
        |         count(CASE WHEN event_type = 'click' THEN 1 END) AS total_carts,
        |         count(CASE WHEN event_type = 'purchase' THEN 1 END) AS total_purchases
        |  FROM events GROUP BY 1),
        |r AS (SELECT *, row_number() OVER (ORDER BY batch_id DESC) AS rn FROM b)
        |SELECT count(*) AS n_batches,
        |       CAST(sum(total_views) AS BIGINT) AS total_views,
        |       CAST(sum(total_carts) AS BIGINT) AS total_carts,
        |       CAST(sum(total_purchases) AS BIGINT) AS total_purchases
        |FROM r WHERE rn <= 10""".stripMargin,
    // newest-batch sessions, heuristic-ladder probability, reference
    // status bucketing; top-20 by (probability desc, session_id) — a
    // deterministic total order, so the 20-row set is engine-identical
    "q_metrics_predictions" ->
      """WITH ev AS (
        |  SELECT CAST(user_id AS VARCHAR) || '_' || strftime(ts, '%Y-%m-%d')
        |           AS session_id,
        |         event_type, value, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
        |  FROM events),
        |mb AS (SELECT max(ts_s // 3600) AS m FROM ev),
        |f AS (
        |  SELECT session_id,
        |         count(CASE WHEN event_type = 'view' THEN 1 END) AS view_count,
        |         count(CASE WHEN event_type = 'click' THEN 1 END) AS cart_count,
        |         max(ts_s) - min(ts_s) AS session_duration,
        |         round(avg(value), 6) AS avg_price,
        |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS purchased
        |  FROM ev, mb WHERE ev.ts_s // 3600 = mb.m GROUP BY session_id),
        |sc AS (
        |  SELECT *, CAST(CASE WHEN cart_count >= 3 THEN 0.85
        |       WHEN cart_count >= 1 THEN 0.60 WHEN view_count >= 10 THEN 0.35
        |       WHEN view_count >= 5 THEN 0.20 ELSE 0.05 END AS DOUBLE)
        |    AS purchase_probability
        |  FROM f)
        |SELECT session_id, view_count, cart_count, session_duration, avg_price,
        |       purchase_probability,
        |       CASE WHEN purchased = 1 THEN 'purchased'
        |            WHEN purchase_probability > 0.7 THEN 'high_intent'
        |            WHEN purchase_probability > 0.4 THEN 'medium_intent'
        |            ELSE 'browsing' END AS status
        |FROM sc ORDER BY purchase_probability DESC, session_id LIMIT 20""".stripMargin,
    "q_heuristic_scores" ->
      s"""$FeaturesSql, scored AS (
         |  SELECT user_session, cart_count, view_count,
         |         CAST(CASE WHEN cart_count >= 3 THEN 0.85 WHEN cart_count >= 1 THEN 0.60
         |              WHEN view_count >= 10 THEN 0.35 WHEN view_count >= 5 THEN 0.20
         |              ELSE 0.05 END AS DOUBLE) AS intent_score
         |  FROM features)
         |SELECT user_session, cart_count, view_count, intent_score,
         |       CASE WHEN intent_score > 0.7 THEN 'high'
         |            WHEN intent_score > 0.4 THEN 'medium' ELSE 'low' END AS intent_bucket
         |FROM scored""".stripMargin,
    // the ladder as integer micros, shared features CTE; F1 as one exact
    // floor division 2tp/(2tp+fp+fn)
    "q_classifier_prf" ->
      s"""$FeaturesSql, sc AS (
         |  SELECT label, CASE WHEN cart_count >= 3 THEN 850000
         |       WHEN cart_count >= 1 THEN 600000 WHEN view_count >= 10 THEN 350000
         |       WHEN view_count >= 5 THEN 200000 ELSE 50000 END AS score_micros
         |  FROM features),
         |t AS (SELECT unnest([50000, 200000, 350000, 600000, 850000]) AS thr),
         |m AS (
         |  SELECT thr,
         |    CAST(sum(CASE WHEN score_micros >= thr AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         |    CAST(sum(CASE WHEN score_micros >= thr AND label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         |    CAST(sum(CASE WHEN score_micros < thr AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         |    CAST(sum(CASE WHEN score_micros < thr AND label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
         |  FROM sc CROSS JOIN t GROUP BY thr)
         |SELECT CAST(thr AS BIGINT) AS thr_micros, tp, fp, fn, tn,
         |  CASE WHEN tp + fp = 0 THEN 0 ELSE tp * 1000000 // (tp + fp) END AS precision_micros,
         |  CASE WHEN tp + fn = 0 THEN 0 ELSE tp * 1000000 // (tp + fn) END AS recall_micros,
         |  CASE WHEN tp * 2 + fp + fn = 0 THEN 0
         |       ELSE 2 * tp * 1000000 // (2 * tp + fp + fn) END AS f1_micros
         |FROM m""".stripMargin,
    "q_calibration" ->
      s"""$FeaturesSql, sc AS (
         |  SELECT label, CASE WHEN cart_count >= 3 THEN 850000
         |       WHEN cart_count >= 1 THEN 600000 WHEN view_count >= 10 THEN 350000
         |       WHEN view_count >= 5 THEN 200000 ELSE 50000 END AS score_micros
         |  FROM features),
         |b AS (
         |  SELECT CAST(score_micros AS BIGINT) AS conf_micros, count(*) AS n,
         |         CAST(sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
         |  FROM sc GROUP BY 1),
         |w AS (
         |  SELECT *, n_pos * 1000000 // n AS acc_micros FROM b)
         |SELECT conf_micros, n, n_pos, acc_micros,
         |       abs(acc_micros - conf_micros) AS gap_micros,
         |       n * abs(acc_micros - conf_micros) // (SELECT count(*) FROM sc)
         |         AS ece_contrib_micros
         |FROM w""".stripMargin,
    "q_gains_by_decile" ->
      s"""$FeaturesSql, sc AS (
         |  SELECT user_session, label, CASE WHEN cart_count >= 3 THEN 850000
         |       WHEN cart_count >= 1 THEN 600000 WHEN view_count >= 10 THEN 350000
         |       WHEN view_count >= 5 THEN 200000 ELSE 50000 END AS score_micros
         |  FROM features),
         |tot AS (SELECT count(*) AS n_total,
         |               CAST(sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |                 AS pos_total FROM sc),
         |r AS (
         |  SELECT label,
         |         row_number() OVER (ORDER BY score_micros DESC, user_session) AS rk
         |  FROM sc),
         |d AS (
         |  SELECT (rk - 1) * 10 // n_total AS decile, count(*) AS n,
         |         CAST(sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
         |  FROM r CROSS JOIN tot GROUP BY 1)
         |SELECT decile, n, n_pos,
         |       CAST(sum(n_pos) OVER (ORDER BY decile
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |         AS cum_pos,
         |       CAST(sum(n_pos) OVER (ORDER BY decile
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |         * 1000000 // greatest((SELECT pos_total FROM tot), 1) AS gain_micros
         |FROM d""".stripMargin,
    // doubled-rank Mann-Whitney: exact average ranks for ties, one floor
    // division at micros
    "q_auc_exact" ->
      s"""$FeaturesSql, sc AS (
         |  SELECT label, CASE WHEN cart_count >= 3 THEN 850000
         |       WHEN cart_count >= 1 THEN 600000 WHEN view_count >= 10 THEN 350000
         |       WHEN view_count >= 5 THEN 200000 ELSE 50000 END AS score_micros
         |  FROM features),
         |b AS (
         |  SELECT score_micros AS s, count(*) AS n,
         |         CAST(sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS np
         |  FROM sc GROUP BY 1),
         |w AS (
         |  SELECT *, CAST(coalesce(sum(n) OVER (ORDER BY s
         |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |    AS cum_before
         |  FROM b),
         |a AS (
         |  SELECT CAST(sum(np * (2 * cum_before + n + 1)) AS BIGINT) AS s2,
         |         CAST(sum(np) AS BIGINT) AS npos,
         |         CAST(sum(n - np) AS BIGINT) AS nneg
         |  FROM w)
         |SELECT npos, nneg,
         |       CASE WHEN npos = 0 OR nneg = 0 THEN 0
         |            ELSE (s2 - npos * (npos + 1)) * 1000000 // (2 * npos * nneg)
         |       END AS auc_micros
         |FROM a""".stripMargin,
    "q_tumbling_activity" ->
      s"""SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_start_s,
        |       count(*) AS n_events,
        |       count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchases,
        |       ${Money.sumSql("value")} AS total_value
        |FROM events GROUP BY 1""".stripMargin,
    "q_sliding_windows" ->
      """WITH ev AS (
        |  SELECT CAST(user_id AS VARCHAR) || '_' || strftime(ts, '%Y-%m-%d') AS user_session,
        |         event_type, ts, value AS price,
        |         regexp_extract(props, '"k": (\d+)', 1) AS product_id,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
        |  FROM events
        |), slotted AS (
        |  SELECT *, unnest(generate_series((ts_s - 300) // 30 + 1, ts_s // 30)) AS slot
        |  FROM ev
        |)
        |SELECT user_session, slot * 30 AS window_start_s,
        |       count(CASE WHEN event_type = 'view' THEN 1 END) AS view_count,
        |       count(CASE WHEN event_type = 'click' THEN 1 END) AS cart_count,
        |       count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase_count,
        |       count(*) AS total_events,
        |       max(ts_s) - min(ts_s) AS session_duration,
        |       round(avg(price), 6) AS avg_price,
        |       max(price) AS max_price,
        |       count(DISTINCT product_id) AS unique_items
        |FROM slotted GROUP BY user_session, slot""".stripMargin,
    // the estimate itself is engine-specific; the CONTRACT (±max(1, 5%)
    // of exact) is the oracled fact — TRUE per row, flipped by any drift
    "q_sliding_approx_checked" ->
      """WITH ev AS (
        |  SELECT CAST(user_id AS VARCHAR) || '_' || strftime(ts, '%Y-%m-%d') AS user_session,
        |         event_type, ts,
        |         regexp_extract(props, '"k": (\d+)', 1) AS product_id,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
        |  FROM events
        |), slotted AS (
        |  SELECT *, unnest(generate_series((ts_s - 300) // 30 + 1, ts_s // 30)) AS slot
        |  FROM ev
        |)
        |SELECT user_session, slot * 30 AS window_start_s,
        |       count(DISTINCT product_id) AS unique_items,
        |       TRUE AS approx_within_5pct
        |FROM slotted GROUP BY user_session, slot""".stripMargin,
    "q_json_extract" ->
      """SELECT event_id, CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT) AS k
        |FROM events""".stripMargin,
    // same values as q_json_extract — the VARIANT path must agree with the
    // schema-on-read path on the same rows
    "q_variant_extract" ->
      """SELECT event_id, CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT) AS k
        |FROM events""".stripMargin,
    "q_tws_counts" ->
      "SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id",
    "q_distinct_ngrams" ->
      s"""WITH t AS (SELECT source, $TokensSql AS toks FROM documents),
         |g AS (
         |  SELECT source, 1 AS n, unnest(toks) AS g FROM t
         |  UNION ALL
         |  SELECT source, 2 AS n,
         |         unnest(list_transform(generate_series(1, len(toks) - 1),
         |                               i -> array_to_string(toks[i:i+1], ' '))) AS g
         |  FROM t
         |  UNION ALL
         |  SELECT source, 3 AS n,
         |         unnest(list_transform(generate_series(1, len(toks) - 2),
         |                               i -> array_to_string(toks[i:i+2], ' '))) AS g
         |  FROM t)
         |SELECT source, n, CAST(count(*) AS BIGINT) AS n_total,
         |       CAST(count(DISTINCT g) AS BIGINT) AS n_unique,
         |       CAST(count(DISTINCT g) * 1000000 // count(*) AS BIGINT) AS distinct_ratio_e6
         |FROM g GROUP BY 1, 2""".stripMargin,
    "q_pipe_syntax" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |       min(o_orderkey) AS first_key, max(o_orderkey) AS last_key
        |FROM orders WHERE o_orderstatus = 'F'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_media_meta" ->
      """SELECT doc_id,
        |       CASE doc_id % 3 WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav'
        |            ELSE 'video/mp4' END AS media_type,
        |       octet_length(encode(text)) AS n_bytes,
        |       sha256(text) AS sha256
        |FROM documents""".stripMargin,
    "q_media_frames" ->
      """SELECT doc_id,
        |       CAST(ceil(ceil(octet_length(encode(text)) / 32.0) / 4.0) AS BIGINT) AS n_frames
        |FROM documents""".stripMargin,
    // byte-replay twin of the mp4 box walker: the fixtures are synthesized
    // from (doc_id, n_chars) by fixed formulas, so the oracle predicts the
    // parsed metadata directly; odd doc_ids are truncated mid-ftyp and
    // must parse to ok=false with null metadata
    "q_media_mp4_meta" ->
      """SELECT doc_id,
        |       doc_id % 2 = 0 AS ok,
        |       CASE WHEN doc_id % 2 = 0 THEN 'mp42' END AS major_brand,
        |       CASE WHEN doc_id % 2 = 0
        |            THEN CAST(600 + (doc_id % 5) * 100 AS BIGINT) END AS timescale,
        |       CASE WHEN doc_id % 2 = 0
        |            THEN CAST(n_chars * 100 AS BIGINT) END AS duration,
        |       CASE WHEN doc_id % 2 = 0
        |            THEN CAST(160 + (doc_id % 32) * 8 AS BIGINT) END AS width,
        |       CASE WHEN doc_id % 2 = 0
        |            THEN CAST(90 + (doc_id % 18) * 16 AS BIGINT) END AS height
        |FROM documents WHERE doc_id % 3 = 2""".stripMargin,
    // byte-replay twin of the AVI walker: metadata predicted from the
    // synthesis formulas; odd doc_ids truncated mid-header → ok=false
    "q_media_avi_meta" ->
      """SELECT doc_id,
        |       doc_id % 2 = 0 AS ok,
        |       CASE WHEN doc_id % 2 = 0 THEN 'DIB ' END AS handler,
        |       CASE WHEN doc_id % 2 = 0
        |            THEN CAST(33333 + (doc_id % 7) * 1000 AS BIGINT) END AS micro_sec_pf,
        |       CASE WHEN doc_id % 2 = 0
        |            THEN CAST(2 + doc_id % 3 AS BIGINT) END AS n_frames,
        |       CASE WHEN doc_id % 2 = 0
        |            THEN CAST(7 + (doc_id % 4) * 4 AS BIGINT) END AS width,
        |       CASE WHEN doc_id % 2 = 0
        |            THEN CAST(6 + (doc_id % 3) * 4 AS BIGINT) END AS height,
        |       CASE WHEN doc_id % 2 = 0 THEN CAST(24 AS BIGINT) END AS bit_count,
        |       CASE WHEN doc_id % 2 = 0 THEN CAST(0 AS BIGINT) END AS compression
        |FROM documents WHERE doc_id % 3 = 2""".stripMargin,
    // pixel-formula replay of the decoded frame grids: every sample is
    // (id + 31f + 7y + 3x + 11c) % 251, so the per-frame sums and x/y
    // moments are exact-integer predictions — a stride or bottom-up
    // mistake in the decoder flips the moments
    "q_media_avi_frames" ->
      """WITH v AS (
        |  SELECT doc_id,
        |         7 + (doc_id % 4) * 4 AS w,
        |         6 + (doc_id % 3) * 4 AS h,
        |         2 + doc_id % 3 AS nf
        |  FROM documents WHERE doc_id % 3 = 2 AND doc_id % 2 = 0),
        |f AS (SELECT doc_id, w, h, unnest(range(0, nf)) AS fi FROM v),
        |fy AS (SELECT doc_id, w, fi, unnest(range(0, h)) AS y FROM f),
        |fx AS (SELECT doc_id, fi, y, unnest(range(0, w)) AS x FROM fy),
        |px AS (SELECT doc_id, fi, y, x,
        |         (doc_id + 31 * fi + 7 * y + 3 * x) % 251 AS b,
        |         (doc_id + 31 * fi + 7 * y + 3 * x + 11) % 251 AS g,
        |         (doc_id + 31 * fi + 7 * y + 3 * x + 22) % 251 AS r
        |       FROM fx)
        |SELECT doc_id, CAST(fi AS BIGINT) AS frame_idx,
        |       CAST(sum(b + g + r) AS BIGINT) AS px_sum,
        |       CAST(sum((x + 1) * (b + g + r)) AS BIGINT) AS x_moment,
        |       CAST(sum((y + 1) * (b + g + r)) AS BIGINT) AS y_moment
        |FROM px GROUP BY 1, 2""".stripMargin,
    // UniMax waterfill replay: cap-ascending prefix predicate, whole-frame
    // kstar/capped_sum windows, floor-division share + lexicographic
    // remainder — all exact BIGINT
    "q_unimax_alloc" ->
      """WITH sz AS (
        |  SELECT source, CAST(sum(n_chars) AS BIGINT) AS size
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(sum(size) AS BIGINT) AS b FROM sz),
        |rk AS (
        |  SELECT source, size, size * 2 AS cap,
        |         row_number() OVER (ORDER BY size * 2, source) AS k,
        |         CAST(sum(size * 2) OVER (ORDER BY size * 2, source
        |                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        |         count(*) OVER () AS n
        |  FROM sz),
        |fl AS (
        |  SELECT rk.*, tot.b,
        |         cap * (n - k + 1) <= tot.b - (cum - cap) AS is_capped
        |  FROM rk CROSS JOIN tot),
        |ag AS (
        |  SELECT fl.*,
        |         CAST(sum(CASE WHEN is_capped THEN 1 ELSE 0 END) OVER () AS BIGINT) AS kstar,
        |         CAST(sum(CASE WHEN is_capped THEN cap ELSE 0 END) OVER () AS BIGINT) AS capped_sum,
        |         row_number() OVER (PARTITION BY is_capped ORDER BY source) AS ur
        |  FROM fl)
        |SELECT source, size, cap,
        |       CASE WHEN is_capped THEN cap
        |            ELSE (b - capped_sum) // (n - kstar)
        |                 + CASE WHEN ur <= (b - capped_sum) % (n - kstar) THEN 1 ELSE 0 END
        |       END AS alloc
        |FROM ag""".stripMargin,
    // winnowing replay: same md5-32 gram hashes, the packed h·2^24 +
    // (2^24-1-pos) key, and a sliding-window MIN — "min hash, rightmost
    // position on ties" falls out of one integer MIN on both engines
    "q_winnow_stats" ->
      s"""${winnowCtes("SELECT doc_id, text FROM documents")}
         |SELECT doc_id, count(*) AS n_fps, count(DISTINCT fp_hash) AS n_hashes,
         |       CAST(sum(fp_hash) AS BIGINT) AS fp_sum
         |FROM fp GROUP BY doc_id""".stripMargin,
    "q_winnow_fp_subset" ->
      s"""${winnowCtes("SELECT doc_id, text FROM documents WHERE doc_id < 50")}
         |SELECT doc_id, fp_hash, fp_pos FROM fp""".stripMargin,
    "q_winnow_pairs" ->
      s"""${winnowCtes(
             """SELECT doc_id, text FROM documents
               |UNION ALL
               |SELECT -doc_id AS doc_id, substring(text, 1, 200) AS text
               |FROM documents WHERE doc_id IN (2, 5, 8)""".stripMargin)},
         |bh AS (SELECT DISTINCT doc_id, fp_hash FROM fp),
         |bc AS (SELECT doc_id, fp_hash,
         |              count(*) OVER (PARTITION BY fp_hash) AS bn FROM bh),
         |pr AS (SELECT a.doc_id AS id1, b.doc_id AS id2
         |       FROM bc a JOIN bc b
         |         ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
         |       WHERE a.bn <= 100 AND b.bn <= 100)
         |SELECT id1, id2, count(*) AS n_shared
         |FROM pr GROUP BY 1, 2 HAVING count(*) >= 3""".stripMargin,
    // the resize round-trip replay: PNG is lossless, so the 2×2 nearest-
    // neighbor samples of the 4×4 gray image equal bytes 0/2/8/10
    "q_media_resize" -> {
      def bv(i: Int) =
        s"CAST(coalesce((strpos('0123456789ABCDEF', px[$i][1:1]) - 1) * 16 + " +
          s"(strpos('0123456789ABCDEF', px[$i][2:2]) - 1), 0) AS INT)"
      s"""WITH b AS (
         |  SELECT doc_id, regexp_extract_all(hex(encode(text)), '..') AS px
         |  FROM documents)
         |SELECT doc_id, ${bv(1)} AS g00, ${bv(3)} AS g10,
         |       ${bv(9)} AS g01, ${bv(11)} AS g11
         |FROM b""".stripMargin
    },
    // dHash byte-fold replay from the hex dump (the q_media_features trick
    // extended to full byte values): per-byte value from the two hex
    // nibbles, positional fold into the 72-cell grid, strict-> difference
    // bits, 16-bit band packing — every step exact integer arithmetic
    "q_media_phash" ->
      s"""${phashCtes("SELECT doc_id, CASE doc_id % 3 WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav' ELSE 'video/mp4' END AS media_type, text FROM documents")}
         |SELECT doc_id, media_type, band_idx, band_val FROM bands""".stripMargin,
    "q_media_phash_neardup" ->
      s"""${phashCtes(
             """SELECT doc_id,
               |       CASE doc_id % 3 WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav' ELSE 'video/mp4' END AS media_type,
               |       text FROM (
               |  SELECT doc_id, text FROM documents
               |  UNION ALL
               |  SELECT -doc_id AS doc_id, text || '!' AS text FROM documents WHERE doc_id IN (3, 6, 9))""".stripMargin)},
         |bq AS (
         |  SELECT doc_id, band_idx, band_val,
         |         count(*) OVER (PARTITION BY band_idx, band_val) AS bn
         |  FROM bands),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         |  FROM bq a JOIN bq b
         |    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
         |   AND a.doc_id < b.doc_id
         |  WHERE a.bn <= 10000 AND b.bn <= 10000),
         |ham AS (
         |  SELECT c.id1, c.id2,
         |         CAST(sum(CASE WHEN x.bit <> y.bit THEN 1 ELSE 0 END) AS INT) AS hamming
         |  FROM cand c
         |  JOIN bits x ON x.doc_id = c.id1
         |  JOIN bits y ON y.doc_id = c.id2 AND y.j = x.j
         |  GROUP BY 1, 2)
         |SELECT id1, id2, hamming FROM ham WHERE hamming <= 3""".stripMargin,
    // f0 is bucket 0 of the stub's 16-bin byte histogram: floorMod(byte,16)=0
    // is exactly "low hex nibble is 0", countable from the hex dump; doing
    // the ratio in FLOAT matches the kernel's float32 division bit-for-bit
    // before the round(6), so even the stubbed feature math is hash-checked.
    "q_media_features" ->
      """WITH b AS (
        |  SELECT doc_id,
        |         CASE doc_id % 3 WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav'
        |              ELSE 'video/mp4' END AS media_type,
        |         octet_length(encode(text)) AS n_bytes,
        |         length(list_filter(regexp_extract_all(hex(encode(text)), '(.)(.)', 2),
        |                            x -> x = '0')) AS n0
        |  FROM documents)
        |SELECT doc_id, media_type, n_bytes,
        |       round(CAST(CAST(n0 AS FLOAT) / CAST(greatest(1, n_bytes) AS FLOAT) AS DOUBLE), 6)
        |         AS f0
        |FROM b""".stripMargin,
    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
        |       ${Money.sumSql("l_quantity")} AS sum_qty,
        |       ${Money.sumSql("l_extendedprice")} AS sum_base_price,
        |       ${Money.sumSql("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
        |       ${Money.sumSql("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
        |       round(avg(l_quantity), 6) AS avg_qty,
        |       round(avg(l_extendedprice), 6) AS avg_price,
        |       round(avg(l_discount), 6) AS avg_disc,
        |       count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q3_top_orders" ->
      s"""WITH top AS (
        |  SELECT o_orderkey, o_orderdate,
        |         ${Money.microsSumSql("l_extendedprice * (1 - l_discount)")} AS rev_u
        |  FROM customer
        |  JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |  WHERE c_mktsegment = 'BUILDING'
        |    AND o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
        |    AND l_shipdate > TIMESTAMP '1998-07-01 00:00:00'
        |  GROUP BY o_orderkey, o_orderdate
        |  ORDER BY rev_u DESC, o_orderkey LIMIT 10)
        |SELECT o_orderkey, o_orderdate, ${Money.microsToMoneySql("rev_u")} AS revenue FROM top""".stripMargin,
    "q5_region_revenue" ->
      s"""SELECT n_name, ${Money.sumSql("l_extendedprice * (1 - l_discount)")} AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |GROUP BY n_name""".stripMargin,
    "q4_priority_check" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
        |                      AND TIMESTAMP '1996-12-31 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority""".stripMargin,
    "q6_forecast_revenue" ->
      s"""SELECT ${Money.sumSql("l_extendedprice * l_discount")} AS revenue
        |FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
        |                     AND TIMESTAMP '1996-12-31 00:00:00'
        |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q10_returned_items" ->
      s"""WITH top AS (
        |  SELECT c_custkey, c_name, n_name,
        |         ${Money.microsSumSql("l_extendedprice * (1 - l_discount)")} AS rev_u
        |  FROM customer
        |  JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  WHERE l_returnflag = 'R'
        |  GROUP BY c_custkey, c_name, n_name
        |  ORDER BY rev_u DESC, c_custkey LIMIT 20)
        |SELECT c_custkey, c_name, n_name, ${Money.microsToMoneySql("rev_u")} AS revenue
        |FROM top""".stripMargin,
    "q12_shipmode_priority" ->
      """SELECT l_linestatus,
        |       count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END)
        |         AS high_line_count,
        |       count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END)
        |         AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |GROUP BY l_linestatus""".stripMargin,
    "q2_min_cost_supplier" ->
      """WITH pc AS (
        |  SELECT p_partkey, p_brand, s_suppkey, s_name, n_name,
        |         min(CAST(round(l_extendedprice * 1e6) AS BIGINT)
        |             // CAST(round(l_quantity) AS BIGINT)) AS cost_micros
        |  FROM lineitem, part, supplier, nation, region
        |  WHERE p_partkey = l_partkey AND p_size < 15
        |    AND s_suppkey = l_suppkey AND n_nationkey = s_nationkey
        |    AND r_regionkey = n_regionkey AND r_name = 'EUROPE'
        |  GROUP BY 1, 2, 3, 4, 5)
        |SELECT p_partkey, p_brand, s_name, n_name AS nation, cost_micros
        |FROM (SELECT pc.*, row_number() OVER (PARTITION BY p_partkey
        |                     ORDER BY cost_micros, s_suppkey) AS rn FROM pc)
        |WHERE rn = 1""".stripMargin,
    "q9_product_profit" ->
      s"""SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
         |       ${Money.sumSql("l_extendedprice * (1 - l_discount)")} AS sum_profit
         |FROM lineitem, part, supplier, nation, orders
         |WHERE p_partkey = l_partkey AND p_name LIKE '%widget%'
         |  AND s_suppkey = l_suppkey AND n_nationkey = s_nationkey
         |  AND o_orderkey = l_orderkey
         |GROUP BY n_name, year(o_orderdate)""".stripMargin,
    "q11_important_parts" ->
      """WITH base AS (
        |  SELECT l_partkey AS p_partkey,
        |         CAST(sum(CAST(round(l_extendedprice * 1e6) AS BIGINT)) AS BIGINT)
        |           AS value_micros
        |  FROM lineitem, supplier, nation, region
        |  WHERE s_suppkey = l_suppkey AND n_nationkey = s_nationkey
        |    AND r_regionkey = n_regionkey AND r_name = 'AFRICA'
        |  GROUP BY l_partkey),
        |tot AS (SELECT CAST(sum(value_micros) AS BIGINT) AS total_micros,
        |               CAST(count(*) AS BIGINT) AS n_parts
        |        FROM base)
        |SELECT p_partkey, value_micros FROM base, tot
        |WHERE value_micros * 10 > (total_micros // n_parts) * 12""".stripMargin,
    "q16_supplier_counts" ->
      """SELECT p_brand, p_type, p_size,
        |       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem, part
        |WHERE p_partkey = l_partkey
        |  AND p_brand <> 'Brand#1'
        |  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_suppkey % 7 = 0)
        |GROUP BY 1, 2, 3""".stripMargin,
    "q20_excess_suppliers" ->
      """WITH pq AS (
        |  SELECT l_suppkey, CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty
        |  FROM lineitem, part
        |  WHERE p_partkey = l_partkey AND p_name LIKE 'small%'
        |    AND l_shipdate BETWEEN TIMESTAMP '1997-01-01 00:00:00'
        |                       AND TIMESTAMP '1997-12-31 00:00:00'
        |  GROUP BY l_suppkey),
        |tot AS (SELECT CAST(sum(qty) AS BIGINT) AS tq, CAST(count(*) AS BIGINT) AS ns
        |        FROM pq)
        |SELECT s_name, n_name AS nation
        |FROM supplier, nation
        |WHERE n_nationkey = s_nationkey
        |  AND s_suppkey IN (SELECT l_suppkey FROM pq, tot WHERE qty * 10 > (tq // ns) * 13)""".stripMargin,
    "q7_volume_shipping" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |       CAST(year(l_shipdate) AS INT) AS l_year,
         |       ${Money.sumSql("l_extendedprice * (1 - l_discount)")} AS revenue
         |FROM supplier, lineitem, orders, customer, nation n1, nation n2
         |WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
         |  AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
         |  AND c_nationkey = n2.n_nationkey
         |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
         |  AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
         |                     AND TIMESTAMP '1997-12-31 00:00:00'
         |GROUP BY n1.n_name, n2.n_name, year(l_shipdate)""".stripMargin,
    "q8_market_share" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |       round(CAST(sum(CASE WHEN n2.n_name = 'NATION_3'
        |               THEN CAST(round((l_extendedprice * (1 - l_discount)) * 1e6) AS BIGINT)
        |               ELSE 0 END) AS DOUBLE)
        |         / sum(CAST(round((l_extendedprice * (1 - l_discount)) * 1e6) AS BIGINT)), 6)
        |         AS mkt_share
        |FROM lineitem, part, orders, customer, supplier, nation n1, nation n2, region
        |WHERE l_partkey = p_partkey AND p_type = 'PROMO'
        |  AND o_orderkey = l_orderkey
        |  AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
        |                      AND TIMESTAMP '1997-12-31 00:00:00'
        |  AND c_custkey = o_custkey AND c_nationkey = n1.n_nationkey
        |  AND n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
        |  AND l_suppkey = s_suppkey AND s_nationkey = n2.n_nationkey
        |GROUP BY year(o_orderdate)""".stripMargin,
    "q13_customer_distribution" ->
      """WITH per_cust AS (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |SELECT c_count, count(*) AS custdist FROM per_cust GROUP BY c_count""".stripMargin,
    "q18_large_orders" ->
      s"""WITH big AS (
         |  SELECT l_orderkey, ${Money.sumSql("l_quantity")} AS total_qty
         |  FROM lineitem GROUP BY l_orderkey
         |  HAVING ${Money.sumSql("l_quantity")} > 150.0)
         |SELECT c_name, c_custkey, o_orderkey, o_totalprice, total_qty
         |FROM big JOIN orders ON o_orderkey = l_orderkey
         |         JOIN customer ON c_custkey = o_custkey
         |ORDER BY total_qty DESC, o_orderkey LIMIT 100""".stripMargin,
    // q17 stated with the correlated-subquery decorrelated as a grouped
    // CTE; the Spark side's window over the part-filtered selection is
    // value-identical (whole partkey groups survive the part filter)
    "q17_small_qty_revenue" ->
      s"""WITH sel AS (
         |  SELECT l_partkey, l_quantity, l_extendedprice
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE p_brand = 'Brand#4' AND p_size <= 5),
         |a AS (SELECT l_partkey, avg(l_quantity) AS avg_qty FROM sel GROUP BY l_partkey)
         |SELECT round(${Money.sumSql("l_extendedprice")} / 7.0, 2) AS avg_yearly
         |FROM sel JOIN a USING (l_partkey)
         |WHERE l_quantity < 0.2 * avg_qty""".stripMargin,
    "q19_disjunctive_revenue" ->
      s"""SELECT ${Money.sumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
         |       AND l_quantity BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20
         |       AND l_quantity BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 25
         |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q21_sole_returned_supplier" ->
      """SELECT s_name, count(*) AS numwait
        |FROM lineitem l1
        |  JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
        |  JOIN supplier ON s_suppkey = l1.l_suppkey
        |WHERE l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin,
    // threshold in exact integer micros; CAST the sum to DOUBLE before the
    // divide (a bare sum(BIGINT) is HUGEINT — the banned pandas-mangled
    // type — and BIGINT*1.0 would detour through DECIMAL)
    "q22_idle_rich_customers" ->
      s"""WITH a AS (
         |  SELECT CAST(sum(CAST(round(c_acctbal * 1e6) AS BIGINT)) AS DOUBLE)
         |           / count(*) AS avg_micros
         |  FROM customer WHERE c_acctbal > 0)
         |SELECT c_nationkey, count(*) AS n_cust,
         |       ${Money.microsToMoneySql("sum(CAST(round(c_acctbal * 1e6) AS BIGINT))")}
         |         AS total_acctbal
         |FROM customer, a
         |WHERE CAST(round(c_acctbal * 1e6) AS BIGINT) > a.avg_micros
         |  AND NOT EXISTS (SELECT 1 FROM orders o
         |                  WHERE o.o_custkey = c_custkey
         |                    AND o.o_orderpriority = '1-URGENT')
         |GROUP BY c_nationkey""".stripMargin,
    "q15_top_supplier" ->
      s"""WITH revenue AS (
         |  SELECT l_suppkey AS supplier_no,
         |         ${Money.sumSql("l_extendedprice * (1 - l_discount)")} AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, total_revenue
         |FROM supplier JOIN revenue ON s_suppkey = supplier_no
         |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)""".stripMargin,
    "q14_promo_effect" ->
      """SELECT round(100.0 *
        |         sum(CASE WHEN p_type = 'PROMO'
        |             THEN CAST(round((l_extendedprice * (1 - l_discount)) * 1e6) AS BIGINT)
        |             ELSE 0 END)
        |         / sum(CAST(round((l_extendedprice * (1 - l_discount)) * 1e6) AS BIGINT)), 6)
        |         AS promo_revenue_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate BETWEEN TIMESTAMP '1997-01-01 00:00:00'
        |                     AND TIMESTAMP '1997-12-31 00:00:00'""".stripMargin,
    "q_part_brand_stats" ->
      s"""SELECT p_brand, count(*) AS n_parts,
        |       CAST(${Money.microsSumSql("p_retailprice")} AS DOUBLE) / 1e6 / count(*)
        |         AS avg_retail,
        |       count(DISTINCT p_type) AS n_types, min(p_size) AS min_size,
        |       max(p_size) AS max_size
        |FROM part GROUP BY p_brand""".stripMargin,
    "q_customer_orders" ->
      s"""SELECT c_custkey, c_name, c_mktsegment,
        |       coalesce(o.n_orders, 0) AS n_orders,
        |       ${Money.microsToMoneySql("coalesce(o.total_spent_u, 0)")} AS total_spent
        |FROM customer LEFT JOIN (
        |  SELECT o_custkey, count(*) AS n_orders,
        |         ${Money.microsSumSql("o_totalprice")} AS total_spent_u
        |  FROM orders GROUP BY o_custkey
        |) o ON c_custkey = o_custkey""".stripMargin,
    "q_top_customers" ->
      s"""WITH top AS (
        |  SELECT c_custkey, c_name, ${Money.microsSumSql("o_totalprice")} AS rev_u,
        |         count(*) AS n_orders
        |  FROM customer JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey, c_name
        |  ORDER BY rev_u DESC, c_custkey LIMIT 10)
        |SELECT c_custkey, c_name, ${Money.microsToMoneySql("rev_u")} AS revenue, n_orders
        |FROM top""".stripMargin,
    "q_customers_without_orders" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q_building_buyers" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_mktsegment = 'BUILDING'
        |  AND EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q_segment_intersect" ->
      """SELECT c_mktsegment FROM customer WHERE c_acctbal > 5000
        |INTERSECT
        |SELECT c_mktsegment FROM customer WHERE c_acctbal < 1000""".stripMargin,
    "q_rollup_revenue" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty,
        |       count(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "q_top_order_per_customer" ->
      """WITH r AS (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |SELECT o_custkey, o_orderkey, o_totalprice FROM r WHERE rn = 1""".stripMargin,
    "q_event_gaps" ->
      """WITH g AS (
        |  SELECT user_id,
        |         CAST(floor(epoch(ts)) AS BIGINT)
        |           - lag(CAST(floor(epoch(ts)) AS BIGINT), 1)
        |             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
        |  FROM events)
        |SELECT user_id, round(avg(gap), 6) AS avg_gap_s, max(gap) AS max_gap_s,
        |       count(*) AS n_gaps
        |FROM g WHERE gap IS NOT NULL GROUP BY user_id""".stripMargin,
    "q_session_window" ->
      s"""WITH g AS (
        |  SELECT user_id, event_id, ts, value, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
        |         lag(CAST(floor(epoch(ts)) AS BIGINT), 1)
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_s
        |  FROM events
        |), m AS (
        |  SELECT *, CASE WHEN prev_s IS NULL OR ts_s - prev_s > 1800 THEN 1 ELSE 0 END AS new_s
        |  FROM g
        |), s AS (
        |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                             ROWS UNBOUNDED PRECEDING) AS session_idx
        |  FROM m)
        |SELECT user_id, min(ts_s) AS start_s, count(*) AS n_events,
        |       ${Money.sumSql("value")} AS total_value
        |FROM s GROUP BY user_id, session_idx""".stripMargin,
    "q_gap_sessions" ->
      s"""WITH g AS (
        |  SELECT user_id, event_id, ts, value, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
        |         lag(CAST(floor(epoch(ts)) AS BIGINT), 1)
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_s
        |  FROM events
        |), m AS (
        |  SELECT *, CASE WHEN prev_s IS NULL OR ts_s - prev_s > 1800 THEN 1 ELSE 0 END AS new_s
        |  FROM g
        |), s AS (
        |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                             ROWS UNBOUNDED PRECEDING) AS session_idx
        |  FROM m)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx, count(*) AS n_events,
        |       max(ts_s) - min(ts_s) AS duration_s, ${Money.sumSql("value")} AS total_value
        |FROM s GROUP BY user_id, session_idx""".stripMargin,
    // independent spelling of interval overlap: running sum over the merged
    // sorted point stream (starts count before a probe at the same value for
    // <=; ends count after a probe at the same value for <). The Spark side
    // computes the same two order statistics bucketized.
    "q_session_overlap" ->
      s"""$SessionBoundsCte,
        |p1 AS (
        |  SELECT start_s AS v, 1 AS st, CAST(NULL AS BIGINT) AS uid,
        |         CAST(NULL AS BIGINT) AS sid FROM sess
        |  UNION ALL
        |  SELECT end_s AS v, 0 AS st, user_id, session_idx FROM sess
        |), r1 AS (
        |  SELECT uid, sid, st,
        |         sum(st) OVER (ORDER BY v, st DESC ROWS UNBOUNDED PRECEDING) AS c
        |  FROM p1
        |), a AS (SELECT uid, sid, CAST(c AS BIGINT) AS n_start_le FROM r1 WHERE st = 0),
        |p2 AS (
        |  SELECT end_s AS v, 1 AS en, CAST(NULL AS BIGINT) AS uid,
        |         CAST(NULL AS BIGINT) AS sid FROM sess
        |  UNION ALL
        |  SELECT start_s AS v, 0 AS en, user_id, session_idx FROM sess
        |), r2 AS (
        |  SELECT uid, sid, en,
        |         sum(en) OVER (ORDER BY v, en ASC ROWS UNBOUNDED PRECEDING) AS c
        |  FROM p2
        |), b AS (SELECT uid, sid, CAST(c AS BIGINT) AS n_end_lt FROM r2 WHERE en = 0)
        |SELECT a.uid AS user_id, a.sid AS session_idx,
        |       CAST(a.n_start_le - b.n_end_lt - 1 AS BIGINT) AS n_overlap
        |FROM a JOIN b ON a.uid = b.uid AND a.sid = b.sid""".stripMargin,
    // same hash-slot arithmetic as NegativeSampler: 48-bit md5 of
    // "user_slot" mod |universe|, min-slot dedupe, anti-join positives,
    // first 5 by slot
    "q_negative_samples" ->
      """WITH inter AS (
        |  SELECT DISTINCT user_id,
        |         CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS item_id
        |  FROM events WHERE regexp_extract(props, '"k": (\d+)', 1) <> ''
        |), univ AS (
        |  SELECT item_id, row_number() OVER (ORDER BY item_id) - 1 AS idx
        |  FROM (SELECT DISTINCT item_id FROM inter)
        |), n AS (SELECT count(*) AS n_items FROM univ),
        |slots AS (
        |  SELECT user_id, unnest(range(1, 11)) AS slot
        |  FROM (SELECT DISTINCT user_id FROM inter)
        |), h AS (
        |  SELECT user_id, slot,
        |         ('0x' || substring(md5(CAST(user_id AS VARCHAR) || '_'
        |                                || CAST(slot AS VARCHAR)), 1, 12))::BIGINT
        |           % n_items AS cidx
        |  FROM slots, n
        |), cand AS (
        |  SELECT h.user_id, univ.item_id, h.slot FROM h JOIN univ ON univ.idx = h.cidx
        |), ded AS (
        |  SELECT user_id, item_id, min(slot) AS slot FROM cand GROUP BY user_id, item_id
        |), neg AS (
        |  SELECT d.user_id, d.item_id, d.slot FROM ded d
        |  LEFT JOIN inter i ON i.user_id = d.user_id AND i.item_id = d.item_id
        |  WHERE i.user_id IS NULL
        |), r AS (
        |  SELECT user_id, item_id,
        |         row_number() OVER (PARTITION BY user_id ORDER BY slot, item_id) AS neg_rank
        |  FROM neg)
        |SELECT user_id, item_id, CAST(neg_rank AS BIGINT) AS neg_rank
        |FROM r WHERE neg_rank <= 5""".stripMargin,
    // unrolled power iteration over the shared edge CTE; every round
    // rounds to 9 decimals exactly as PageRank.ranks does
    "q_pagerank" -> {
      val iters = (1 to 5).map { i =>
        s"""r$i AS (
           |  SELECT bi.b AS node,
           |         round(CAST(0.15 AS DOUBLE) / (SELECT n FROM nn)
           |               + CAST(0.85 AS DOUBLE) * sum(r${i - 1}.r / deg.d), 9) AS r
           |  FROM bi JOIN r${i - 1} ON r${i - 1}.node = bi.a JOIN deg ON deg.a = bi.a
           |  GROUP BY bi.b)""".stripMargin
      }.mkString(",\n")
      s"""$EdgesCte,
         |deg AS (SELECT a, count(*) AS d FROM bi GROUP BY a),
         |nn AS (SELECT count(DISTINCT a) AS n FROM bi),
         |r0 AS (SELECT DISTINCT a AS node,
         |         round(CAST(1.0 AS DOUBLE) / (SELECT n FROM nn), 9) AS r FROM bi),
         |$iters
         |SELECT node AS doc_id, round(r, 6) AS pagerank FROM r5""".stripMargin
    },
    // seeded PPR: integer mass replay — r//d contributions (non-negative,
    // so // ≡ DIV), per-node sums CAST BIGINT before the one float op per
    // node-round (0.85·s + 0.5 floor), MATERIALIZED round-per-CTE
    "q_ppr_contamination" -> {
      val iters = (1 to 4).map { i =>
        s"""p$i AS MATERIALIZED (
           |  SELECT m.node,
           |         b2.tele + CAST(floor(CAST(0.85 AS DOUBLE)
           |             * CAST(m.s AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS r
           |  FROM (SELECT bi.b AS node,
           |               CAST(sum(p${i - 1}.r // deg.d) AS BIGINT) AS s
           |        FROM bi JOIN p${i - 1} ON p${i - 1}.node = bi.a
           |             JOIN deg ON deg.a = bi.a
           |        GROUP BY bi.b) m
           |  JOIN pbase b2 ON b2.node = m.node)""".stripMargin
      }.mkString(",\n")
      s"""$EdgesCte,
         |deg AS (SELECT a, count(*) AS d FROM bi GROUP BY a),
         |pns AS (SELECT count(DISTINCT a) AS n FROM bi WHERE a % 20 = 0),
         |pbase AS MATERIALIZED (
         |  SELECT DISTINCT a AS node,
         |         CASE WHEN a % 20 = 0
         |              THEN 150000000000 // (SELECT n FROM pns) ELSE 0 END AS tele,
         |         CASE WHEN a % 20 = 0
         |              THEN 1000000000000 // (SELECT n FROM pns) ELSE 0 END AS r0v
         |  FROM bi),
         |p0 AS (SELECT node, r0v AS r FROM pbase),
         |$iters
         |SELECT node, r AS ppr_e12 FROM p4""".stripMargin
    },
    // same integer-cents moments, identical IEEE derivation of sigma,
    // round-6 weights, floor quotas, md5-order membership
    "q_stratified_neyman" ->
      """WITH e AS (
        |  SELECT event_id, event_type,
        |         CAST(round(value * 100, 0) AS BIGINT) AS c
        |  FROM events
        |), st AS (
        |  SELECT event_type, count(*) AS n_s,
        |         CAST(sum(c) AS BIGINT) AS sy, CAST(sum(c * c) AS BIGINT) AS syy
        |  FROM e GROUP BY event_type
        |), w AS (
        |  SELECT event_type, n_s,
        |         round(n_s * sqrt(GREATEST(
        |           CASE WHEN n_s > 1
        |                THEN (CAST(syy AS DOUBLE) / n_s
        |                      - (CAST(sy AS DOUBLE) / n_s) * (CAST(sy AS DOUBLE) / n_s))
        |                     * n_s / (n_s - 1.0)
        |                ELSE CAST(0.0 AS DOUBLE) END, CAST(0.0 AS DOUBLE))), 6) AS w_s
        |  FROM st
        |), tw AS (SELECT round(sum(w_s), 6) AS w_tot FROM w),
        |q AS (
        |  SELECT w.event_type, w.n_s, w.w_s,
        |         CASE WHEN tw.w_tot > 0
        |              THEN LEAST(CAST(floor(200 * w.w_s / tw.w_tot) AS BIGINT), w.n_s)
        |              ELSE 0 END AS quota
        |  FROM w, tw
        |), r AS (
        |  SELECT event_id, event_type,
        |         row_number() OVER (PARTITION BY event_type
        |           ORDER BY ('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 12))::BIGINT,
        |                    event_id) AS samp_rank
        |  FROM e)
        |SELECT r.event_id, r.event_type, CAST(r.samp_rank AS BIGINT) AS samp_rank,
        |       CAST(q.quota AS BIGINT) AS quota
        |FROM r JOIN q ON r.event_type = q.event_type
        |WHERE r.samp_rank <= q.quota""".stripMargin,
    // quantile_cont is DuckDB's exact interpolated percentile (same
    // definition as Spark's percentile); fences round-6 on both sides
    "q_winsorize" ->
      """WITH f AS (
        |  SELECT event_type,
        |         round(quantile_cont(CAST(value AS DOUBLE), 0.01), 6) AS fence_lo,
        |         round(quantile_cont(CAST(value AS DOUBLE), 0.99), 6) AS fence_hi
        |  FROM events GROUP BY event_type
        |)
        |SELECT e.event_id, e.event_type, e.value, f.fence_lo, f.fence_hi,
        |       LEAST(GREATEST(CAST(e.value AS DOUBLE), f.fence_lo), f.fence_hi) AS clipped
        |FROM events e JOIN f ON e.event_type = f.event_type""".stripMargin,
    // quantile_cont twice (the winsorize parity), second pass over
    // |v - med| with the round-6 med; the 1.4826 consistency constant is
    // CAST AS DOUBLE (decimal-literal ban) — DECIMAL(5,4)→double equals
    // strtod here since 14826/10000.0 is correctly rounded
    "q_robust_scale" ->
      """WITH f AS (
        |  SELECT event_type,
        |         round(quantile_cont(CAST(value AS DOUBLE), 0.5), 6) AS med
        |  FROM events GROUP BY event_type
        |), f2 AS (
        |  SELECT e.event_type,
        |         round(quantile_cont(abs(CAST(e.value AS DOUBLE) - f.med), 0.5), 6)
        |           AS mad
        |  FROM events e JOIN f USING (event_type) GROUP BY e.event_type
        |)
        |SELECT e.event_id, e.event_type, e.value, f.med, f2.mad,
        |       CASE WHEN f2.mad > 0
        |            THEN round((CAST(e.value AS DOUBLE) - f.med)
        |                       / (CAST(1.4826 AS DOUBLE) * f2.mad), 6)
        |       END AS robust_z
        |FROM events e JOIN f USING (event_type) JOIN f2 USING (event_type)""".stripMargin,
    // identical rebased-x stats (round-6 BEFORE the derived arithmetic on
    // both sides), then the same closed-form slope/intercept/R2
    "q_trend_slopes" ->
      """WITH e AS (
        |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, value FROM events
        |), b AS (
        |  SELECT user_id,
        |         (ts_s - min(ts_s) OVER (PARTITION BY user_id))
        |           / CAST(3600.0 AS DOUBLE) AS x,
        |         CAST(value AS DOUBLE) AS y
        |  FROM e
        |), st AS (
        |  SELECT user_id, count(*) AS n,
        |         round(sum(x), 6) AS sx, round(sum(y), 6) AS sy,
        |         round(sum(x * y), 6) AS sxy, round(sum(x * x), 6) AS sxx,
        |         round(sum(y * y), 6) AS syy
        |  FROM b GROUP BY user_id
        |)
        |SELECT user_id, CAST(n AS BIGINT) AS n, sx, sy, sxy, sxx, syy,
        |       round(CASE WHEN n * sxx - sx * sx > 0
        |         THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END, 6) AS slope,
        |       round(CASE WHEN n * sxx - sx * sx > 0
        |         THEN (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n END, 6)
        |         AS intercept,
        |       round(CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
        |         THEN ((n * sxy - sx * sy) * (n * sxy - sx * sy))
        |              / ((n * sxx - sx * sx) * (n * syy - sy * sy)) END, 6) AS r2
        |FROM st""".stripMargin,
    // same md5-rank basket cap, then the canonical a < b pair count
    "q_copurchase" ->
      """WITH inter AS (
        |  SELECT DISTINCT user_id,
        |         CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS item_id
        |  FROM events WHERE regexp_extract(props, '"k": (\d+)', 1) <> ''
        |), capped AS (
        |  SELECT user_id, item_id FROM (
        |    SELECT user_id, item_id,
        |           row_number() OVER (PARTITION BY user_id
        |             ORDER BY ('0x' || substring(md5(CAST(item_id AS VARCHAR)), 1, 12))::BIGINT,
        |                      item_id) AS r
        |    FROM inter)
        |  WHERE r <= 20
        |)
        |SELECT a.item_id AS item_a, b.item_id AS item_b, count(*) AS n_users
        |FROM capped a JOIN capped b
        |  ON a.user_id = b.user_id AND a.item_id < b.item_id
        |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin,
    // bucket ids from identical IEEE (v-lo)/(hi-lo)*64 arithmetic; integer
    // cumsums make the CDFs exact; psi spells pG/pR with the same +eps
    // association as Drift.vsRest (1e-6 scientific literal IS a double in
    // DuckDB — the decimal-literal ban hits 0.000001, not 1e-6)
    "q_drift_by_type" ->
      """WITH r AS (SELECT event_type AS g, value AS v FROM events
        |           WHERE value IS NOT NULL),
        |bounds AS (SELECT min(v) AS lo, max(v) AS hi FROM r),
        |bk AS (SELECT g,
        |         CASE WHEN hi = lo THEN 0
        |              ELSE CAST(LEAST(GREATEST(floor((v - lo) / (hi - lo) * 64),
        |                                       CAST(0.0 AS DOUBLE)),
        |                              CAST(63.0 AS DOUBLE)) AS BIGINT)
        |         END AS b
        |       FROM r, bounds),
        |c AS (SELECT g, b, count(*) AS cnt FROM bk GROUP BY 1, 2),
        |gs AS (SELECT g, CAST(sum(cnt) AS BIGINT) AS n_g FROM c GROUP BY g),
        |spine AS (SELECT gs.g, gs.n_g, t.b
        |          FROM gs, (SELECT unnest(range(0, 64)) AS b) t),
        |f AS (SELECT spine.g, spine.b, spine.n_g, coalesce(c.cnt, 0) AS cnt
        |      FROM spine LEFT JOIN c ON c.g = spine.g AND c.b = spine.b),
        |pb AS (SELECT b, CAST(sum(cnt) AS BIGINT) AS c_all FROM f GROUP BY b),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_all FROM c),
        |e AS (SELECT f.g, f.b, f.n_g, f.cnt, pb.c_all, tot.n_all,
        |        CAST(sum(f.cnt) OVER (PARTITION BY f.g ORDER BY f.b)
        |             AS BIGINT) AS cum_g,
        |        CAST(sum(pb.c_all) OVER (PARTITION BY f.g ORDER BY f.b)
        |             AS BIGINT) AS cum_all
        |      FROM f JOIN pb USING (b), tot)
        |SELECT g AS event_type, max(n_g) AS n,
        |  round(max(abs(CAST(cum_g AS DOUBLE) / n_g
        |                - CAST(cum_all - cum_g AS DOUBLE) / (n_all - n_g))), 6)
        |    AS ks_d,
        |  round(sum((CAST(cnt AS DOUBLE) / n_g + 1e-6
        |             - (CAST(c_all - cnt AS DOUBLE) / (n_all - n_g) + 1e-6))
        |            * ln((CAST(cnt AS DOUBLE) / n_g + 1e-6)
        |                 / (CAST(c_all - cnt AS DOUBLE) / (n_all - n_g) + 1e-6))), 6)
        |    AS psi
        |FROM e WHERE n_all - n_g > 0 GROUP BY g""".stripMargin,
    // the batch funnel chain again (stream/batch parity makes it the
    // oracle for the static streaming run); the times prefix serialized —
    // t-nulls only ever trail, so the filtered list IS the prefix
    "q_funnel_stream" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_ns(ts) // 1000 AS ts_us FROM events
        |), s1 AS (
        |  SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts_us END) AS t1
        |  FROM e GROUP BY user_id
        |), s2 AS (
        |  SELECT e.user_id, s1.t1,
        |         min(CASE WHEN e.event_type = 'click' AND e.ts_us >= s1.t1
        |                  THEN e.ts_us END) AS t2
        |  FROM e JOIN s1 ON e.user_id = s1.user_id GROUP BY e.user_id, s1.t1
        |), s3 AS (
        |  SELECT e.user_id, s2.t1, s2.t2,
        |         min(CASE WHEN e.event_type = 'purchase' AND e.ts_us >= s2.t2
        |                  THEN e.ts_us END) AS t3
        |  FROM e JOIN s2 ON e.user_id = s2.user_id GROUP BY e.user_id, s2.t1, s2.t2
        |)
        |SELECT user_id,
        |       array_to_string(list_filter([t1, t2, t3], x -> x IS NOT NULL), ',')
        |         AS times_str,
        |       CAST((t1 IS NOT NULL)::INT + (t2 IS NOT NULL)::INT
        |            + (t3 IS NOT NULL)::INT AS BIGINT) AS stage
        |FROM s3 WHERE t1 IS NOT NULL""".stripMargin,
    // chained conditional mins replayed as grouped passes; micros on both
    // sides (DuckDB's scan already truncated nanos -> micros)
    // SCD2: same lag-change-filter → lead-interval chain; micros time,
    // event_id tiebreak; version CAST to Spark's INT
    "q_scd2_intervals" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) // 1000 AS ts_us, event_id, event_type
        |  FROM events
        |), lagd AS (
        |  SELECT *, lag(event_type) OVER (PARTITION BY user_id
        |                                  ORDER BY ts_us, event_id) AS prev
        |  FROM e
        |), chg AS (
        |  SELECT user_id, ts_us, event_id, event_type
        |  FROM lagd WHERE prev IS NULL OR prev <> event_type
        |)
        |SELECT user_id, event_type, ts_us AS valid_from,
        |       lead(ts_us) OVER w AS valid_to,
        |       CAST(row_number() OVER w AS INT) AS version,
        |       (lead(ts_us) OVER w IS NULL) AS is_current
        |FROM chg
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)""".stripMargin,
    // triangles on the shared shingle-edge CTE: two-hop join finds each
    // a<b<c exactly once; degrees from the bidirectional list
    "q_triangle_stats" ->
      s"""$EdgesCte,
         |tri AS (
         |  SELECT ab.src AS a, ab.dst AS b, bc.dst AS c
         |  FROM e ab
         |  JOIN e bc ON ab.dst = bc.src
         |  JOIN e ac ON ac.src = ab.src AND ac.dst = bc.dst
         |), tcount AS (
         |  SELECT node, CAST(count(*) AS BIGINT) AS triangles
         |  FROM (SELECT unnest([a, b, c]) AS node FROM tri) GROUP BY node
         |), deg AS (
         |  SELECT a AS node, count(*) AS degree FROM bi GROUP BY a
         |)
         |SELECT d.node, CAST(d.degree AS BIGINT) AS degree,
         |       coalesce(t.triangles, 0) AS triangles,
         |       CASE WHEN d.degree >= 2
         |            THEN round(CAST(2.0 AS DOUBLE) * coalesce(t.triangles, 0)
         |                       / (d.degree * (d.degree - 1)), 6)
         |       END AS clustering
         |FROM deg d LEFT JOIN tcount t ON d.node = t.node""".stripMargin,
    // Markov transitions: lead over (user; ts_us, event_id) — micros on
    // both sides (nanos truncate at the DuckDB scan), integer counts,
    // probability round-6
    "q_markov_transitions" ->
      """WITH e AS (
        |  SELECT user_id, event_type AS cur, epoch_ns(ts) // 1000 AS ts_us,
        |         event_id
        |  FROM events
        |), seq AS (
        |  SELECT cur,
        |         lead(cur) OVER (PARTITION BY user_id
        |                         ORDER BY ts_us, event_id) AS next
        |  FROM e
        |), pairs AS (
        |  SELECT cur, next, count(*) AS n FROM seq
        |  WHERE next IS NOT NULL GROUP BY cur, next
        |), tot AS (
        |  SELECT cur, CAST(sum(n) AS BIGINT) AS n_from FROM pairs GROUP BY cur
        |)
        |SELECT p.cur, p.next, CAST(p.n AS BIGINT) AS n, t.n_from,
        |       round(CAST(p.n AS DOUBLE) / t.n_from, 6) AS p
        |FROM pairs p JOIN tot t ON p.cur = t.cur""".stripMargin,
    // Markov entropy: exact n/n_from ratios inside -(p·ln p), sum round-6
    "q_markov_entropy" ->
      """WITH e AS (
        |  SELECT user_id, event_type AS cur, epoch_ns(ts) // 1000 AS ts_us,
        |         event_id
        |  FROM events
        |), seq AS (
        |  SELECT cur,
        |         lead(cur) OVER (PARTITION BY user_id
        |                         ORDER BY ts_us, event_id) AS next
        |  FROM e
        |), pairs AS (
        |  SELECT cur, next, count(*) AS n FROM seq
        |  WHERE next IS NOT NULL GROUP BY cur, next
        |), tot AS (
        |  SELECT cur, CAST(sum(n) AS BIGINT) AS n_from FROM pairs GROUP BY cur
        |)
        |SELECT t.cur, t.n_from,
        |       round(sum(-((CAST(p.n AS DOUBLE) / t.n_from)
        |                   * ln(CAST(p.n AS DOUBLE) / t.n_from))), 6) AS entropy
        |FROM pairs p JOIN tot t ON p.cur = t.cur
        |GROUP BY t.cur, t.n_from""".stripMargin,
    // seasonal decomposition: centered 24-row MA (12 preceding / 11
    // following) — NO float is ever aggregated: lossless integer micros,
    // exact window/group sums, identical final divisions, floor rounds
    "q_seasonal_decompose" ->
      """WITH series AS (
        |  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h,
        |         round(avg(value), 6) AS v
        |  FROM events GROUP BY h
        |), vi AS (
        |  SELECT h, v,
        |         CAST(round(v * CAST(1000000.0 AS DOUBLE)) AS BIGINT) AS vim
        |  FROM series
        |), t AS (
        |  SELECT h, v, vim,
        |         CASE WHEN count(vim) OVER w = 24
        |              THEN CAST(sum(vim) OVER w AS BIGINT)
        |         END AS tsum,
        |         h % 24 AS phase
        |  FROM vi
        |  WINDOW w AS (ORDER BY h ROWS BETWEEN 12 PRECEDING AND 11 FOLLOWING)
        |), t2 AS (
        |  SELECT h, v, phase, tsum,
        |         floor(CAST(tsum AS DOUBLE) / CAST(24000000.0 AS DOUBLE)
        |               * CAST(1000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE))
        |           / CAST(1000000.0 AS DOUBLE) AS trend,
        |         24 * vim - tsum AS det
        |  FROM t
        |), seas AS (
        |  SELECT phase,
        |         floor(CAST(sum(det) AS DOUBLE)
        |               / (count(*) * CAST(24000000.0 AS DOUBLE))
        |               * CAST(1000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE))
        |           / CAST(1000000.0 AS DOUBLE) AS seasonal
        |  FROM t2 WHERE tsum IS NOT NULL GROUP BY phase
        |)
        |SELECT t2.h, t2.phase, t2.v, t2.trend, s.seasonal,
        |       floor((t2.v - t2.trend - s.seasonal) * CAST(1000000.0 AS DOUBLE)
        |             + CAST(0.5 AS DOUBLE)) / CAST(1000000.0 AS DOUBLE) AS resid
        |FROM t2 LEFT JOIN seas s ON t2.phase = s.phase""".stripMargin,
    // cohort retention: DISTINCT (user, day) replaces the collect_set fold;
    // counts exact integers, ratio round-6 on both engines
    "q_cohort_retention" ->
      """WITH p AS (
        |  SELECT DISTINCT user_id AS u,
        |         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS period
        |  FROM events
        |), c AS (
        |  SELECT u, min(period) AS cohort FROM p GROUP BY u
        |), o AS (
        |  SELECT p.u, c.cohort, p.period - c.cohort AS period_offset
        |  FROM p JOIN c ON p.u = c.u
        |), cells AS (
        |  SELECT cohort, period_offset, count(*) AS n_active
        |  FROM o GROUP BY cohort, period_offset
        |), sized AS (
        |  SELECT cohort, period_offset, n_active,
        |         max(CASE WHEN period_offset = 0 THEN n_active END)
        |           OVER (PARTITION BY cohort) AS cohort_size
        |  FROM cells)
        |SELECT cohort, period_offset, CAST(n_active AS BIGINT) AS n_active,
        |       CAST(cohort_size AS BIGINT) AS cohort_size,
        |       round(CAST(n_active AS DOUBLE) / cohort_size, 6) AS retention
        |FROM sized""".stripMargin,
    // LOO target encoding: exact-integer n/Σy per category; rate and
    // smoothed rate spelled op-for-op as TargetEncode evaluates them
    "q_target_encode_loo" ->
      """WITH e AS (
        |  SELECT event_id, user_id,
        |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events
        |), g AS (
        |  SELECT user_id, count(*) AS te_n, CAST(sum(y) AS BIGINT) AS te_sum
        |  FROM e GROUP BY user_id
        |), p AS (
        |  SELECT CAST(sum(y) AS DOUBLE) / count(*) AS prior FROM e
        |)
        |SELECT e.event_id, e.user_id, CAST(e.y AS BIGINT) AS y,
        |       CAST(g.te_n AS BIGINT) AS te_n, g.te_sum,
        |       CASE WHEN g.te_n > 1
        |            THEN floor(CAST(g.te_sum - e.y AS DOUBLE) / (g.te_n - 1)
        |                       * CAST(1000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE))
        |                 / CAST(1000000.0 AS DOUBLE)
        |       END AS loo_rate,
        |       floor((g.te_sum - e.y + CAST(10.0 AS DOUBLE) * p.prior)
        |             / (g.te_n - 1 + CAST(10.0 AS DOUBLE))
        |             * CAST(1000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE))
        |         / CAST(1000000.0 AS DOUBLE) AS loo_smoothed
        |FROM e JOIN g ON e.user_id = g.user_id CROSS JOIN p""".stripMargin,
    "q_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_ns(ts) // 1000 AS ts_us FROM events
        |), s1 AS (
        |  SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts_us END) AS t1
        |  FROM e GROUP BY user_id
        |), s2 AS (
        |  SELECT e.user_id, s1.t1,
        |         min(CASE WHEN e.event_type = 'click' AND e.ts_us >= s1.t1
        |                  THEN e.ts_us END) AS t2
        |  FROM e JOIN s1 ON e.user_id = s1.user_id GROUP BY e.user_id, s1.t1
        |), s3 AS (
        |  SELECT e.user_id, s2.t1, s2.t2,
        |         min(CASE WHEN e.event_type = 'purchase' AND e.ts_us >= s2.t2
        |                  THEN e.ts_us END) AS t3
        |  FROM e JOIN s2 ON e.user_id = s2.user_id GROUP BY e.user_id, s2.t1, s2.t2
        |)
        |SELECT user_id, CAST(t1 AS BIGINT) AS t_step1, CAST(t2 AS BIGINT) AS t_step2,
        |       CAST(t3 AS BIGINT) AS t_step3,
        |       (t1 IS NOT NULL)::INT + (t2 IS NOT NULL)::INT + (t3 IS NOT NULL)::INT
        |         AS stage,
        |       CAST(t2 - t1 AS BIGINT) AS us_view_to_click,
        |       CAST(t3 - t2 AS BIGINT) AS us_click_to_purchase
        |FROM s3""".stripMargin,
    // identical frame spelling; flag from round-6 z on both sides so the
    // |z| > 3 boundary can't flip on a last-ulp stddev difference
    "q_anomaly_zscore" ->
      """WITH e AS (
        |  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h FROM events
        |), a AS (
        |  SELECT event_type, h, count(*) AS n_events FROM e GROUP BY 1, 2
        |), s AS (
        |  SELECT event_type, h, n_events,
        |         count(n_events) OVER w AS trailing_n,
        |         avg(n_events) OVER w AS trailing_mean,
        |         stddev_samp(n_events) OVER w AS trailing_std
        |  FROM a WINDOW w AS (PARTITION BY event_type ORDER BY h
        |                      ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
        |), z AS (
        |  SELECT event_type, h, n_events, trailing_n, trailing_mean, trailing_std,
        |         CASE WHEN trailing_n >= 12 AND trailing_std > 0
        |              THEN (n_events - trailing_mean) / trailing_std END AS z
        |  FROM s)
        |SELECT event_type, CAST(h AS BIGINT) AS h, CAST(n_events AS BIGINT) AS n_events,
        |       CAST(trailing_n AS BIGINT) AS trailing_n,
        |       round(trailing_mean, 6) AS trailing_mean,
        |       round(trailing_std, 6) AS trailing_std,
        |       round(z, 6) AS z,
        |       COALESCE(abs(round(z, 6)) > 3.0, FALSE) AS is_anomaly
        |FROM z""".stripMargin,
    // IDCG replayed as the same left fold (list_reduce needs the 0.0 seed
    // prepended — no init arg in DuckDB 1.0); every float output round-6
    "q_ranking_metrics" ->
      """WITH inter AS (
        |  SELECT user_id, event_type,
        |         CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS item_id
        |  FROM events WHERE regexp_extract(props, '"k": (\d+)', 1) <> ''
        |), cnt AS (
        |  SELECT user_id, item_id, count(*) AS n FROM inter GROUP BY 1, 2
        |), rk AS (
        |  SELECT user_id, item_id,
        |         row_number() OVER (PARTITION BY user_id ORDER BY n DESC, item_id) AS rank
        |  FROM cnt
        |), rel AS (
        |  SELECT DISTINCT user_id, item_id FROM inter WHERE event_type = 'purchase'
        |), nr AS (SELECT user_id, count(*) AS n_rel FROM rel GROUP BY 1),
        |h AS (
        |  SELECT r.user_id,
        |         sum(CASE WHEN rel.item_id IS NOT NULL THEN 1 ELSE 0 END) AS hits,
        |         min(CASE WHEN rel.item_id IS NOT NULL THEN r.rank END) AS first_hit,
        |         sum(CASE WHEN rel.item_id IS NOT NULL
        |                  THEN CAST(1.0 AS DOUBLE) / log2(r.rank + 1)
        |                  ELSE CAST(0.0 AS DOUBLE) END) AS dcg
        |  FROM rk r LEFT JOIN rel ON r.user_id = rel.user_id AND r.item_id = rel.item_id
        |  WHERE r.rank <= 10
        |  GROUP BY r.user_id
        |), m AS (
        |  SELECT nr.user_id, nr.n_rel,
        |         COALESCE(h.hits, 0) AS hits,
        |         CAST(COALESCE(h.hits, 0) AS DOUBLE) / nr.n_rel AS recall_raw,
        |         COALESCE(CAST(1.0 AS DOUBLE) / h.first_hit, CAST(0.0 AS DOUBLE)) AS mrr_raw,
        |         COALESCE(h.dcg, CAST(0.0 AS DOUBLE))
        |           / list_reduce(
        |               list_prepend(CAST(0.0 AS DOUBLE),
        |                 list_transform(range(1, least(10, nr.n_rel) + 1),
        |                   i -> CAST(1.0 AS DOUBLE) / log2(i + 1))),
        |               (a, x) -> a + x) AS ndcg_raw
        |  FROM nr LEFT JOIN h ON nr.user_id = h.user_id
        |)
        |SELECT user_id, CAST(n_rel AS BIGINT) AS n_rel, CAST(hits AS BIGINT) AS hits,
        |       round(recall_raw, 6) AS recall_at_k,
        |       round(mrr_raw, 6) AS mrr,
        |       round(ndcg_raw, 6) AS ndcg_at_k
        |FROM m""".stripMargin,
    // scalable twin: identical slot arithmetic; the universe index is the
    // bucketed one — row_number over (md5_48 % 64, md5_48, item) replays
    // offset + within-bucket rank exactly
    "q_negative_samples_scalable" ->
      """WITH inter AS (
        |  SELECT DISTINCT user_id,
        |         CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS item_id
        |  FROM events WHERE regexp_extract(props, '"k": (\d+)', 1) <> ''
        |), ih AS (
        |  SELECT item_id,
        |         ('0x' || substring(md5(CAST(item_id AS VARCHAR)), 1, 12))::BIGINT AS h
        |  FROM (SELECT DISTINCT item_id FROM inter)
        |), univ AS (
        |  SELECT item_id, row_number() OVER (ORDER BY h % 64, h, item_id) - 1 AS idx
        |  FROM ih
        |), n AS (SELECT count(*) AS n_items FROM univ),
        |slots AS (
        |  SELECT user_id, unnest(range(1, 11)) AS slot
        |  FROM (SELECT DISTINCT user_id FROM inter)
        |), h AS (
        |  SELECT user_id, slot,
        |         ('0x' || substring(md5(CAST(user_id AS VARCHAR) || '_'
        |                                || CAST(slot AS VARCHAR)), 1, 12))::BIGINT
        |           % n_items AS cidx
        |  FROM slots, n
        |), cand AS (
        |  SELECT h.user_id, univ.item_id, h.slot FROM h JOIN univ ON univ.idx = h.cidx
        |), ded AS (
        |  SELECT user_id, item_id, min(slot) AS slot FROM cand GROUP BY user_id, item_id
        |), neg AS (
        |  SELECT d.user_id, d.item_id, d.slot FROM ded d
        |  LEFT JOIN inter i ON i.user_id = d.user_id AND i.item_id = d.item_id
        |  WHERE i.user_id IS NULL
        |), r AS (
        |  SELECT user_id, item_id,
        |         row_number() OVER (PARTITION BY user_id ORDER BY slot, item_id) AS neg_rank
        |  FROM neg)
        |SELECT user_id, item_id, CAST(neg_rank AS BIGINT) AS neg_rank
        |FROM r WHERE neg_rank <= 5""".stripMargin,
    "q_event_sessions" ->
      s"""$SessionBoundsCte
        |SELECT e.event_id, e.user_id, s.session_idx
        |FROM (SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
        |      FROM events) e
        |JOIN sess s ON e.user_id = s.user_id
        |           AND e.ts_s BETWEEN s.start_s AND s.end_s""".stripMargin,
    // the naive BETWEEN spelling IS the oracle — DuckDB can afford it at
    // verify scale; the Spark side must produce identical pairs from the
    // bucketized equi-join
    "q_range_join" ->
      s"""$SessionBoundsCte,
        |marks AS (SELECT DISTINCT (start_s // 3600) * 3600 AS mark_s FROM sess)
        |SELECT m.mark_s, s.user_id, s.session_idx
        |FROM marks m JOIN sess s ON m.mark_s BETWEEN s.start_s AND s.end_s""".stripMargin,
    // linear interpolation: same spine as q_gap_fill; pv/pb from the
    // backward IGNORE NULLS window, nv/nb forward; the interp expression
    // is spelled op-for-op as Densify.interpolate evaluates it
    "q_interpolate" ->
      """WITH hourly AS (
        |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h,
        |         round(avg(value), 6) AS v
        |  FROM events GROUP BY user_id, h
        |), bounds AS (
        |  SELECT user_id, min(h) AS lo, max(h) AS hi FROM hourly GROUP BY user_id
        |), spine AS (
        |  SELECT user_id, unnest(range(lo, hi + 1)) AS h FROM bounds
        |), j AS (
        |  SELECT s.user_id, s.h, hr.v
        |  FROM spine s LEFT JOIN hourly hr
        |    ON s.user_id = hr.user_id AND s.h = hr.h
        |), m AS (
        |  SELECT user_id, h, v,
        |         last_value(v IGNORE NULLS) OVER wb AS pv,
        |         last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
        |           OVER wb AS pb,
        |         first_value(v IGNORE NULLS) OVER wf AS nv,
        |         first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
        |           OVER wf AS nb
        |  FROM j
        |  WINDOW wb AS (PARTITION BY user_id ORDER BY h
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         wf AS (PARTITION BY user_id ORDER BY h
        |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |)
        |SELECT user_id, h, v,
        |       floor((CASE WHEN v IS NOT NULL THEN v
        |                   WHEN pv IS NOT NULL AND nv IS NOT NULL
        |                   THEN pv + (nv - pv) * (CAST(h - pb AS DOUBLE) / (nb - pb))
        |              END) * CAST(1000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE))
        |         / CAST(1000000.0 AS DOUBLE) AS v_interp
        |FROM m""".stripMargin,
    // Levenshtein verify: identical unit-cost DP in both engines — exact
    // integer distance, one exact division for the normalization
    "q_editdist_verify" ->
      """WITH pairs AS (
        |  SELECT doc_id AS id1, doc_id + 1 AS id2 FROM documents
        |  UNION ALL
        |  SELECT doc_id AS id1, doc_id + 2 AS id2 FROM documents
        |)
        |SELECT p.id1, p.id2,
        |       CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist,
        |       CASE WHEN greatest(length(a.text), length(b.text)) = 0
        |            THEN CAST(0.0 AS DOUBLE)
        |            ELSE round(CAST(levenshtein(a.text, b.text) AS DOUBLE)
        |                       / greatest(length(a.text), length(b.text)), 6)
        |       END AS norm_dist
        |FROM pairs p
        |JOIN documents a ON p.id1 = a.doc_id
        |JOIN documents b ON p.id2 = b.doc_id""".stripMargin,
    "q_gap_fill" ->
      """WITH e AS (
        |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h, value FROM events
        |), a AS (
        |  SELECT user_id, h, count(*) AS n_events, round(avg(value), 6) AS v
        |  FROM e GROUP BY user_id, h
        |), b AS (
        |  SELECT user_id, min(h) AS lo, max(h) AS hi FROM a GROUP BY user_id
        |), sp AS (
        |  SELECT user_id, unnest(range(lo, hi + 1)) AS h FROM b
        |), j AS (
        |  SELECT sp.user_id, sp.h, COALESCE(a.n_events, 0) AS n_events, a.v
        |  FROM sp LEFT JOIN a ON sp.user_id = a.user_id AND sp.h = a.h
        |)
        |SELECT user_id, h, CAST(n_events AS BIGINT) AS n_events,
        |       last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY h
        |         ROWS UNBOUNDED PRECEDING) AS value_ff
        |FROM j""".stripMargin,
    "q_concurrency_timeline" ->
      s"""$SessionBoundsCte,
        |st AS (SELECT start_s // 3600 AS bucket, count(*) AS n_started FROM sess GROUP BY 1),
        |en AS (SELECT end_s // 3600 AS bucket, count(*) AS n_ended FROM sess GROUP BY 1),
        |j AS (
        |  SELECT COALESCE(st.bucket, en.bucket) AS bucket,
        |         COALESCE(st.n_started, 0) AS n_started,
        |         COALESCE(en.n_ended, 0) AS n_ended
        |  FROM st FULL OUTER JOIN en ON st.bucket = en.bucket
        |)
        |SELECT CAST(bucket AS BIGINT) AS bucket, CAST(n_started AS BIGINT) AS n_started,
        |       CAST(n_ended AS BIGINT) AS n_ended,
        |       CAST(sum(n_started) OVER w - sum(n_ended) OVER w AS BIGINT) AS n_open_after
        |FROM j WINDOW w AS (ORDER BY bucket ROWS UNBOUNDED PRECEDING)""".stripMargin,
    "q_running_revenue" ->
      s"""SELECT o_custkey, o_orderkey,
        |       ${Money.sumSql("o_totalprice",
             " OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS UNBOUNDED PRECEDING)")}
        |         AS running_total,
        |       round(avg(o_totalprice) OVER (PARTITION BY o_custkey
        |             ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS trailing3_avg
        |FROM orders""".stripMargin,
    "q_order_window_funcs" ->
      """SELECT o_custkey, o_orderkey,
        |       lead(CAST(floor(epoch(o_orderdate)) AS BIGINT), 1)
        |         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |         - CAST(floor(epoch(o_orderdate)) AS BIGINT) AS next_gap_s,
        |       CAST(ntile(4) OVER wp AS INT) AS price_quartile,
        |       round(percent_rank() OVER wp, 6) AS price_pct_rank,
        |       round(cume_dist() OVER wp, 6) AS price_cume_dist
        |FROM orders
        |WINDOW wp AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)""".stripMargin,
    "q_pivot_type_hour" ->
      """SELECT CAST(hour(ts) AS INT) AS hour_of_day,
        |       count(*) FILTER (WHERE event_type = 'view') AS n_view,
        |       count(*) FILTER (WHERE event_type = 'click') AS n_click,
        |       count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
        |       count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
        |       count(*) FILTER (WHERE event_type = 'error') AS n_error
        |FROM events GROUP BY 1""".stripMargin,
    "q_full_outer_activity" ->
      """WITH ev AS (SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id),
        |ord AS (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey)
        |SELECT COALESCE(user_id, o_custkey) AS key_id,
        |       CAST(COALESCE(n_events, 0) AS BIGINT) AS n_events,
        |       CAST(COALESCE(n_orders, 0) AS BIGINT) AS n_orders
        |FROM ev FULL OUTER JOIN ord ON user_id = o_custkey""".stripMargin,
    "q_sql_parity" -> SqlParitySql,
    "q_cube_status" ->
      s"""SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
        |       ${Money.sumSql("o_totalprice")} AS revenue,
        |       CAST(GROUPING_ID(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin,
    "q_event_funnel" ->
      """WITH f AS (
        |  SELECT user_id,
        |         min(CASE WHEN event_type = 'view' THEN ts END) AS tv,
        |         min(CASE WHEN event_type = 'click' THEN ts END) AS tc,
        |         min(CASE WHEN event_type = 'purchase' THEN ts END) AS tp
        |  FROM events GROUP BY user_id)
        |SELECT count(*) AS n_users,
        |       count(CASE WHEN tv IS NOT NULL AND tc IS NOT NULL AND tv < tc THEN 1 END)
        |         AS view_then_click,
        |       count(CASE WHEN tv IS NOT NULL AND tc IS NOT NULL AND tp IS NOT NULL
        |                   AND tv < tc AND tc < tp THEN 1 END) AS full_funnel
        |FROM f""".stripMargin,
    "q_monthly_orders" ->
      s"""SELECT CAST(floor(epoch(date_trunc('month', o_orderdate))) AS BIGINT) AS month_start_s,
        |       count(*) AS n_orders, ${Money.sumSql("o_totalprice")} AS total
        |FROM orders GROUP BY 1""".stripMargin,
    "q_name_strings" ->
      """SELECT c_custkey, upper(c_name) AS name_u, length(c_name) AS name_len,
        |       substring(c_name, 1, 8) AS name_prefix
        |FROM customer WHERE c_name LIKE '%1%'""".stripMargin,
    "q_word_freq" ->
      s"""WITH w AS (
         |  SELECT unnest($TokensSql) AS word FROM documents
         |), c AS (
         |  SELECT word, count(*) AS n FROM w GROUP BY word
         |  ORDER BY n DESC, word LIMIT 20)
         |SELECT word, n FROM c""".stripMargin,
    // same fold as TextFunctions.fingerprintPortable: 48-bit md5 token hash
    // mod the 31-bit prime, polynomial acc*31+h mod prime (list_reduce has
    // no init arg in DuckDB 1.0 — prepend the 0 seed)
    "q_fingerprints_md5" ->
      s"""WITH t AS (SELECT doc_id, $TokensSql AS toks FROM documents)
         |SELECT doc_id, list_reduce(
         |  list_prepend(CAST(0 AS BIGINT), list_transform(toks, tok ->
         |    ('0x' || substring(md5(tok), 1, 12))::BIGINT % 2147483629)),
         |  (acc, h) -> (acc * 31 + h) % 2147483629) AS fp
         |FROM t""".stripMargin,
    // generated 48-bit portable SimHash replay: per-bit ±1 position sums
    // (independent expressions in ONE select — no alias chaining, so no
    // tree-substitution blowup), sign bits OR'd as a power-of-two sum
    "q_simhash_md5" -> SimhashMd5OracleSql,
    // generated 16-lane portable MinHash replay: lane-salted md5-48
    // minima over the distinct-3-shingle list (independent expressions,
    // no alias chaining)
    "q_minhash_md5_sigs" -> MinhashMd5OracleSql,
    // dynamic-batching padding waste: two global ranks, (rk-1)//32 batch
    // ids, integer per-batch padding, one replayed floor-6 division
    "q_batch_padding" ->
      s"""WITH t AS (SELECT doc_id, CAST(len($TokensSql) AS BIGINT) AS n_tokens
         |           FROM documents),
         |a AS (SELECT n_tokens, row_number() OVER (ORDER BY doc_id) AS rk FROM t),
         |ab AS (SELECT (rk - 1) // 32 AS b, count(*) AS bn,
         |              max(n_tokens) AS bmax, CAST(sum(n_tokens) AS BIGINT) AS bsum
         |       FROM a GROUP BY 1),
         |ar AS (SELECT 'arrival' AS strategy, CAST(count(*) AS BIGINT) AS n_batches,
         |              CAST(sum(bsum) AS BIGINT) AS total_tokens,
         |              CAST(sum(bn * bmax - bsum) AS BIGINT) AS total_padding
         |       FROM ab),
         |s AS (SELECT n_tokens, row_number() OVER (ORDER BY n_tokens, doc_id) AS rk FROM t),
         |sb AS (SELECT (rk - 1) // 32 AS b, count(*) AS bn,
         |              max(n_tokens) AS bmax, CAST(sum(n_tokens) AS BIGINT) AS bsum
         |       FROM s GROUP BY 1),
         |sr AS (SELECT 'length_sorted' AS strategy, CAST(count(*) AS BIGINT) AS n_batches,
         |              CAST(sum(bsum) AS BIGINT) AS total_tokens,
         |              CAST(sum(bn * bmax - bsum) AS BIGINT) AS total_padding
         |       FROM sb)
         |SELECT strategy, n_batches, total_tokens, total_padding,
         |       floor(CAST(total_padding AS DOUBLE) / CAST(total_tokens AS DOUBLE)
         |             * 1000000.0 + 0.5) / 1000000.0 AS overhead
         |FROM (SELECT * FROM ar UNION ALL SELECT * FROM sr)""".stripMargin,
    "q_mixture_rebalance" ->
      """WITH w(lang, wt) AS (
        |  VALUES ('en', 2.0), ('zh', 1.0), ('es', 1.0), ('de', 1.0), ('fr', 1.0)
        |), c AS (
        |  SELECT lang, count(*) AS n FROM documents GROUP BY lang
        |), s AS (
        |  SELECT min(c.n / w.wt) AS scale FROM c JOIN w USING (lang)
        |), q AS (
        |  SELECT w.lang, CAST(floor(w.wt * s.scale) AS BIGINT) AS keep_n FROM w, s
        |), r AS (
        |  SELECT doc_id, lang,
        |         row_number() OVER (PARTITION BY lang
        |                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
        |           AS samp_rank
        |  FROM documents
        |)
        |SELECT r.doc_id, r.lang, CAST(r.samp_rank AS BIGINT) AS samp_rank, q.keep_n
        |FROM r JOIN q ON r.lang = q.lang WHERE r.samp_rank <= q.keep_n""".stripMargin,
    "q_mixture_tokens" ->
      s"""WITH w(lang, wt) AS (
        |  VALUES ('en', 2.0), ('zh', 1.0), ('es', 1.0), ('de', 1.0), ('fr', 1.0)
        |), d AS (
        |  SELECT doc_id, lang, CAST(len($TokensSql) AS BIGINT) AS n_tok FROM documents
        |), t AS (
        |  SELECT lang, CAST(sum(n_tok) AS BIGINT) AS tt FROM d GROUP BY lang
        |), s AS (
        |  SELECT min(t.tt / w.wt) AS scale FROM t JOIN w USING (lang)
        |), q AS (
        |  SELECT w.lang, CAST(floor(w.wt * s.scale) AS BIGINT) AS budget_n FROM w, s
        |), r AS (
        |  SELECT doc_id, lang, n_tok,
        |         CAST(sum(n_tok) OVER (PARTITION BY lang
        |                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
        |                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tok_cum
        |  FROM d
        |)
        |SELECT r.doc_id, r.lang, r.n_tok, r.tok_cum, q.budget_n
        |FROM r JOIN q USING (lang) WHERE r.tok_cum <= q.budget_n""".stripMargin,
    // stride = 40 - 10 = 30; DuckDB list slice toks[st+1 : st+40] is the
    // 40-token window (inclusive bounds)
    "q_chunking" ->
      s"""WITH t AS (SELECT doc_id, $TokensSql AS toks FROM documents),
        |c AS (
        |  SELECT doc_id, unnest(range(0, len(toks), 30)) AS st, toks
        |  FROM t WHERE len(toks) > 0
        |)
        |SELECT doc_id, CAST(st // 30 AS BIGINT) AS chunk_idx,
        |       array_to_string(toks[st + 1:st + 40], ' ') AS chunk_text,
        |       CAST(len(toks[st + 1:st + 40]) AS BIGINT) AS n_chunk_tokens
        |FROM c""".stripMargin,
    // same trailing-8-gram md5-48 boundary draw; range() end is exclusive
    // so cuts stop at n-1 and the tail chunk stays nonempty
    "q_cdc_chunks" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
        |c AS (
        |  SELECT doc_id, text, n,
        |    list_filter(range(8, GREATEST(n, 8)), i ->
        |      ('0x' || substring(md5(substring(text, CAST(i - 7 AS INT), 8)), 1, 12))::BIGINT
        |        % 64 = 0) AS cuts
        |  FROM d),
        |s AS (
        |  SELECT doc_id, text, n,
        |    list_prepend(CAST(1 AS BIGINT), list_transform(cuts, c -> c + 1)) AS starts,
        |    list_append(cuts, CAST(n AS BIGINT)) AS ends
        |  FROM c)
        |SELECT doc_id, j AS chunk_idx, starts[j] AS start_pos,
        |       ends[j] - starts[j] + 1 AS chunk_len,
        |       md5(substring(text, CAST(starts[j] AS INT),
        |                     CAST(ends[j] - starts[j] + 1 AS INT))) AS chunk_md5
        |FROM s, unnest(range(1, len(starts) + 1)) AS t(j)""".stripMargin,
    // BPE iteration-0: char-pair counts (with the </w> end marker) over the
    // word-frequency table, weighted by word count
    "q_bpe_pair_counts" ->
      s"""WITH tok AS (SELECT unnest($TokensSql) AS word FROM documents),
        |w AS (SELECT word, count(*) AS n FROM tok GROUP BY word),
        |px AS (SELECT word, n, unnest(range(1, length(word) + 1)) AS i FROM w),
        |p AS (
        |  SELECT substring(word, i, 1) AS l,
        |         CASE WHEN i = length(word) THEN '</w>'
        |              ELSE substring(word, i + 1, 1) END AS r,
        |         n
        |  FROM px
        |)
        |SELECT l, r, CAST(sum(n) AS BIGINT) AS cnt
        |FROM p GROUP BY l, r
        |ORDER BY cnt DESC, l, r LIMIT 20""".stripMargin,
    // items with count > n_group/(k+1), k=2 — exactly what the two-pass
    // sketch computes, stated as the straight histogram filter
    "q_heavy_hitters" ->
      """WITH c AS (
        |  SELECT source, lang, count(*) AS n_item FROM documents
        |  WHERE lang IS NOT NULL GROUP BY source, lang
        |), t AS (
        |  SELECT source, CAST(sum(n_item) AS BIGINT) AS n_group FROM c GROUP BY source
        |)
        |SELECT c.source, c.lang, c.n_item, t.n_group
        |FROM c JOIN t USING (source)
        |WHERE c.n_item * 3 > t.n_group""".stripMargin,
    "q_value_correlation" ->
      """SELECT l_returnflag,
        |       round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
        |       round(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_cov,
        |       round(stddev_samp(l_extendedprice), 4) AS price_stddev,
        |       count(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_value_percentiles" ->
      """SELECT event_type, round(quantile_cont(value, 0.5), 6) AS p50,
        |       round(quantile_cont(value, 0.9), 6) AS p90
        |FROM events GROUP BY event_type""".stripMargin,
    "q_topk_prices" ->
      """WITH r AS (
        |  SELECT l_returnflag, l_extendedprice,
        |         row_number() OVER (PARTITION BY l_returnflag
        |                            ORDER BY l_extendedprice DESC) AS rank
        |  FROM lineitem)
        |SELECT l_returnflag, rank, l_extendedprice AS price FROM r WHERE rank <= 5""".stripMargin,
    "q_token_stats" ->
      s"""SELECT doc_id,
         |       len($TokensSql) AS n_tokens,
         |       len(list_filter($TokensSql, x -> list_contains($StopSql, x))) AS stop_hits,
         |       length(text) AS text_len
         |FROM documents""".stripMargin,
    // per-codepoint split on both engines (fixture is BMP-only — the CDC
    // oracle already leans on the same length/substring parity); +0.0
    // normalizes -0.0 exactly like the Spark side
    "q_char_entropy" ->
      """WITH c AS (
        |  SELECT doc_id,
        |         list_filter(list_transform(range(1, length(text) + 1),
        |                                    i -> substring(text, CAST(i AS INT), 1)),
        |                     x -> len(x) > 0) AS cs
        |  FROM documents)
        |SELECT doc_id, CAST(len(cs) AS BIGINT) AS n_chars,
        |       round(CASE WHEN len(cs) = 0 THEN CAST(0.0 AS DOUBLE)
        |         ELSE -list_sum(list_transform(
        |                list_transform(list_distinct(cs),
        |                               ch -> len(list_filter(cs, x -> x = ch))),
        |                c2 -> CAST(c2 AS DOUBLE) / len(cs)
        |                      * log2(CAST(c2 AS DOUBLE) / len(cs))))
        |              + CAST(0.0 AS DOUBLE)
        |         END, 6) AS char_entropy
        |FROM c""".stripMargin,
    "q_quality_scores" ->
      s"""WITH t AS (
         |  SELECT doc_id, text,
         |         len($TokensSql) AS n_tokens,
         |         len(list_filter($TokensSql, x -> list_contains($StopSql, x))) AS stop_hits,
         |         length(regexp_replace(trim(text), '\\s+', '', 'g')) AS nonspace_len,
         |         length(text) AS text_len,
         |         length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS n_punct
         |  FROM documents
         |), m AS (
         |  SELECT doc_id, n_tokens,
         |         CASE WHEN n_tokens = 0 THEN 0.0
         |              ELSE CAST(nonspace_len AS DOUBLE) / n_tokens END AS avg_token_len,
         |         CASE WHEN n_tokens = 0 THEN 0.0
         |              ELSE CAST(stop_hits AS DOUBLE) / n_tokens END AS stopword_ratio,
         |         CASE WHEN text_len = 0 THEN 0.0
         |              ELSE CAST(n_punct AS DOUBLE) / text_len END AS punct_ratio
         |  FROM t)
         |SELECT doc_id, n_tokens, avg_token_len, stopword_ratio,
         |       CAST(round(CAST(
         |             (CASE WHEN n_tokens >= 50 THEN 1.0 WHEN n_tokens >= 10 THEN 0.7
         |                   WHEN n_tokens >= 3 THEN 0.3 ELSE 0.0 END) * 0.4
         |           + (CASE WHEN punct_ratio <= 0.2 THEN 1.0 ELSE 0.3 END) * 0.2
         |           + (CASE WHEN stopword_ratio >= 0.05 THEN 1.0 ELSE 0.5 END) * 0.2
         |           + (CASE WHEN avg_token_len BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.4 END) * 0.2
         |         AS DOUBLE), 4) AS DOUBLE) AS quality_score
         |FROM m""".stripMargin,
    "q_vocab" ->
      s"""WITH w AS (SELECT unnest($TokensSql) AS word FROM documents),
         |c AS (SELECT word, count(*) AS n FROM w GROUP BY word HAVING count(*) >= 2)
         |SELECT word, n,
         |       CAST(row_number() OVER (ORDER BY n DESC, word) AS INT) AS token_id
         |FROM c""".stripMargin,
    // same vocab construction as q_vocab; sequence order restored from the
    // explode position (pos), never from row order
    "q_encode" ->
      s"""WITH w AS (SELECT unnest($TokensSql) AS word FROM documents),
         |c AS (SELECT word, count(*) AS n FROM w GROUP BY word HAVING count(*) >= 2),
         |v AS (SELECT word,
         |        CAST(row_number() OVER (ORDER BY n DESC, word) AS INT) AS token_id
         |      FROM c),
         |t AS (SELECT doc_id, $TokensSql AS toks FROM documents),
         |p AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS pos FROM t),
         |tok AS (SELECT doc_id, pos, toks[pos] AS word FROM p),
         |enc AS (SELECT tok.doc_id, tok.pos, coalesce(v.token_id, -1) AS tid
         |        FROM tok LEFT JOIN v USING (word))
         |SELECT doc_id,
         |       string_agg(CAST(tid AS VARCHAR), ' ' ORDER BY pos) AS token_seq,
         |       count(*) AS n_tokens,
         |       CAST(sum(CASE WHEN tid = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unk
         |FROM enc GROUP BY doc_id""".stripMargin,
    "q_source_rollup" ->
      s"""WITH t AS (
         |  SELECT source, lang, md5(text) AS h,
         |         CAST(len(ws) AS BIGINT) AS n_toks,
         |         CASE WHEN len(ws) = 0 THEN 0.0
         |              ELSE 1 - CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) END AS dwf
         |  FROM (SELECT *, $TokensSql AS ws FROM documents))
         |SELECT source, count(*) AS n_docs, count(DISTINCT lang) AS n_langs,
         |       CAST(sum(n_toks) AS BIGINT) AS total_tokens,
         |       count(*) - count(DISTINCT h) AS dup_docs,
         |       round(avg(dwf), 6) AS avg_dup_word_frac
         |FROM t GROUP BY source""".stripMargin,
    // the oracle replays the prefix sum as the naive global window —
    // DuckDB can afford one partition at verify scale; the Spark side must
    // telescope to identical totals from the distributed three-step
    "q_token_shards" ->
      s"""WITH t AS (
         |  SELECT doc_id, CAST(len($TokensSql) AS BIGINT) AS n_tokens,
         |         ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT AS h
         |  FROM documents
         |), r AS (
         |  SELECT doc_id, n_tokens,
         |         CAST(sum(n_tokens) OVER (ORDER BY h, doc_id
         |                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
         |           AS running_total
         |  FROM t)
         |SELECT doc_id, n_tokens, running_total,
         |       CAST((running_total - n_tokens) // 20000 AS BIGINT) AS shard
         |FROM r""".stripMargin,
    "q_packing" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang, CAST(len($TokensSql) AS BIGINT) AS n_tokens
         |  FROM documents),
         |o AS (
         |  SELECT doc_id, lang, n_tokens,
         |         sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
         |                             ROWS UNBOUNDED PRECEDING) - n_tokens
         |           AS start_offset
         |  FROM t)
         |SELECT doc_id, lang, n_tokens,
         |       CAST(start_offset AS BIGINT) AS start_offset,
         |       CAST(floor(start_offset / 512) AS BIGINT) AS seq_idx,
         |       n_tokens > 0 AND
         |         floor((start_offset + n_tokens - 1) / 512)
         |           <> floor(start_offset / 512) AS straddles
         |FROM o""".stripMargin,
    "q_lm_score" -> LmScoreOracleSql,
    "q_doremi_weights" -> DoremiOracleSql,
    "q_doremi_epochs" -> DoremiEpochsOracleSql,
    "q_simhash_embed_neardup" -> SimhashEmbedOracleSql,
    "q_cosine_neardup" -> CosineNearDupOracleSql,
    "q_knn_lsh" -> KnnLshOracleSql,
    "q_bootstrap_ci" -> BootstrapOracleSql,
    "q_bootstrap_by_source" -> BootstrapBySourceOracleSql,
    "q_bootstrap_uplift" -> BootstrapUpliftOracleSql,
    "q_agreement_kappa" -> AgreementOracleSql,
    "q_isotonic_calibration" -> IsotonicOracleSql,
    "q_psi_by_source" -> PsiOracleSql,
    "q_conversion_wilson" -> WilsonOracleSql,
    "q_ks_arms" -> KsOracleSql,
    "q_chi2_lang_source" -> Chi2OracleSql,
    "q_cms_counts" -> CmsOracleSql,
    "q_hll_md5" -> HllOracleSql,
    "q_incremental_stats" -> IncrementalStatsOracleSql,
    "q_quantile_sketch" -> QuantileSketchOracleSql,
    "q_user_overlap" -> UserOverlapOracleSql,
    // batch replay of the live bottom-k: distinct (type, user) with the
    // md5-48 draw, k smallest per group ("group" quoted — reserved word)
    "q_stream_bottomk" ->
      """WITH m AS (
        |  SELECT DISTINCT event_type AS "group",
        |         CAST(user_id AS VARCHAR) AS member,
        |         CAST(user_id AS BIGINT) AS v
        |  FROM events),
        |h AS (SELECT *, ('0x' || substring(md5(member), 1, 12))::BIGINT AS hk FROM m)
        |SELECT "group", member, hk, v FROM (
        |  SELECT *, row_number() OVER (PARTITION BY "group" ORDER BY hk, member) AS sr
        |  FROM h)
        |WHERE sr <= 64""".stripMargin,
    // coordinated-sample join-size replay: the self-join domain is the
    // grouped (key, cnt) table, bottom-256 by the md5-48 draw, Σc² scaled
    // by the inverted k-th order statistic (exact when the domain < k)
    "q_join_size_est" ->
      """WITH dom AS (
        |  SELECT CAST(l_partkey AS VARCHAR) AS key, CAST(count(*) AS BIGINT) AS c,
        |         ('0x' || substring(md5(CAST(l_partkey AS VARCHAR)), 1, 12))::BIGINT AS hk
        |  FROM lineitem GROUP BY 1),
        |kept AS (SELECT * FROM dom ORDER BY hk, key LIMIT 256),
        |est AS (SELECT CAST(count(*) AS BIGINT) AS k_used,
        |               CAST(sum(c * c) AS BIGINT) AS sampled_pairs,
        |               CAST(max(hk) AS BIGINT) AS hk_top
        |        FROM kept),
        |ex AS (SELECT CAST(sum(c * c) AS BIGINT) AS exact_join_size FROM dom),
        |fin AS (SELECT k_used, sampled_pairs,
        |               CASE WHEN k_used < 256 THEN k_used
        |                    ELSE (k_used - 1) * 281474976710656
        |                         // greatest(hk_top, 1) END AS domain_est,
        |               exact_join_size
        |        FROM est, ex)
        |SELECT k_used, sampled_pairs, domain_est,
        |       sampled_pairs * domain_est // k_used AS join_size_est,
        |       exact_join_size
        |FROM fin""".stripMargin,
    "q_hyperball" -> HyperBallOracleSql,
    "q_length_buckets" -> LengthBucketsOracleSql,
    // HTML shell + strip/extract replay — RE2-safe regexes ((?s), lazy
    // .*?, explicit whitespace class — never \s), chained literal entity
    // replaces, the q_url_canon split chain for the href canon
    "q_html_strip" ->
      s"""WITH h AS (SELECT doc_id, $SyntheticHtmlSql AS html FROM documents)
         |SELECT doc_id, trim(regexp_replace(
         |  replace(replace(replace(replace(replace(replace(
         |    regexp_replace(regexp_replace(regexp_replace(html,
         |      '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
         |      '(?s)<style[^>]*>.*?</style>', ' ', 'g'),
         |      '<[^>]*>', ' ', 'g'),
         |    '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
         |    '&#39;', ''''), '&amp;', '&'),
         |  '[ \t\n\r]+', ' ', 'g')) AS clean
         |FROM h""".stripMargin,
    "q_html_links" ->
      s"""WITH h AS (SELECT doc_id, $SyntheticHtmlSql AS html FROM documents),
         |lx AS (SELECT doc_id, unnest(range(1, len(hr) + 1)) AS link_idx, unnest(hr) AS href
         |       FROM (SELECT doc_id, regexp_extract_all(html, 'href="([^"]*)"', 1) AS hr FROM h)),
         |q AS (SELECT doc_id, link_idx, href,
         |             split_part(split_part(href, '#', 1), '?', 1) AS base,
         |             CASE WHEN position('?' IN split_part(href, '#', 1)) > 0
         |                  THEN split_part(split_part(href, '#', 1), '?', 2) ELSE '' END AS qs
         |      FROM lx),
         |s AS (SELECT doc_id, link_idx, href, qs,
         |             split_part(base, '://', 1) AS scheme,
         |             split_part(split_part(base, '://', 2), '/', 1) AS hst,
         |             substr(split_part(base, '://', 2),
         |                    len(split_part(split_part(base, '://', 2), '/', 1)) + 1,
         |                    1048576) AS path
         |      FROM q)
         |SELECT doc_id, CAST(link_idx AS INT) AS link_idx, href,
         |       lower(scheme) || '://' || lower(hst) || rtrim(path, '/') ||
         |       CASE WHEN kept <> '' THEN '?' || kept ELSE '' END AS canon,
         |       lower(hst) AS host
         |FROM (SELECT *, array_to_string(list_sort(list_filter(string_split(qs, '&'),
         |        x -> x <> '' AND NOT starts_with(x, 'utm_')
         |             AND NOT starts_with(x, 'fbclid=')
         |             AND NOT starts_with(x, 'gclid=')
         |             AND NOT starts_with(x, 'ref='))), '&') AS kept
         |      FROM s)""".stripMargin,
    "q_hyperball_diameter" ->
      s"""WITH nf AS (
         |  SELECT t, CAST(sum(est_e6) AS BIGINT) AS nf_e6
         |  FROM ($HyperBallOracleSql) GROUP BY t),
         |fin AS (SELECT nf_e6 AS nf_fin FROM nf WHERE t = 3)
         |SELECT t, nf_e6, nf_e6 * 10 >= nf_fin * 9 AS reached90
         |FROM nf CROSS JOIN fin""".stripMargin,
    "q_stream_join" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_ns(ts) // 1000 AS us FROM events),
        |v AS (SELECT user_id, event_id AS view_id, us AS v_us FROM e WHERE event_type = 'view'),
        |b AS (SELECT user_id, event_id AS buy_id, us AS b_us FROM e WHERE event_type = 'purchase')
        |SELECT v.user_id, v.view_id, b.buy_id, b.b_us - v.v_us AS lag_us
        |FROM v JOIN b ON v.user_id = b.user_id
        | AND b.b_us >= v.v_us AND b.b_us <= v.v_us + 1800000000""".stripMargin,
    "q_survival_km" -> SurvivalOracleSql,
    "q_logrank_arms" -> LogRankOracleSql,
    "q_logrank_strat" -> LogRankStratOracleSql,
    "q_dp_mean" -> DpMeanOracleSql,
    "q_sketch_bracket" -> SketchBracketOracleSql,
    "q_stratified_ate" -> CausalOracleSql,
    "q_ate_bootstrap" -> AteBootstrapOracleSql,
    "q_conformal_coverage" -> ConformalOracleSql,
    "q_fdr_bh" -> FdrBhOracleSql,
    "q_k_anonymity" -> KAnonOracleSql,
    "q_l_diversity" -> LDiversityOracleSql,
    "q_dp_histogram" -> DpHistogramOracleSql,
    "q_robust_trend" -> RobustTrendOracleSql,
    "q_semantic_dedup_det" -> SemDedupDetOracleSql,
    // pruned twin of q_lm_score: uni/bi HAVING >= 2, LEFT joins so pruned
    // positions fall back to 0-count smoothing (V stays unpruned) — the
    // same math LmScore.scoreStateless ships as map literals
    "q_lm_score_stateless" ->
      s"""WITH t AS (SELECT doc_id, $TokensSql AS toks FROM documents),
         |pos AS (
         |  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
         |                 i -> toks[i] || ' ' || toks[i + 1])) AS b
         |  FROM t),
         |uni AS (SELECT w, count(*) AS cu
         |        FROM (SELECT unnest(toks) AS w FROM t) GROUP BY w
         |        HAVING count(*) >= 2),
         |bi AS (SELECT b, count(*) AS cb FROM pos GROUP BY b
         |       HAVING count(*) >= 2),
         |v AS (SELECT count(DISTINCT w) AS v
         |      FROM (SELECT unnest(toks) AS w FROM t))
         |SELECT pos.doc_id, count(*) AS n_bigrams,
         |       round(avg(ln((coalesce(bi.cb, 0) + 1.0) /
         |                    (coalesce(uni.cu, 0) + 1.0 * v.v))), 6) AS avg_logp
         |FROM pos LEFT JOIN bi USING (b)
         |         LEFT JOIN uni ON uni.w = split_part(pos.b, ' ', 1)
         |         CROSS JOIN v
         |GROUP BY pos.doc_id""".stripMargin,
    // the composed pipeline, stated as one SQL document: dedup window +
    // quality exprs + decontamination EXISTS, same thresholds; keep's dwf
    // comparison is unrounded on both sides
    // ledger oracle NESTS the per-stage oracle SQLs as derived tables, so
    // the composed contract cannot drift from the stage contracts
    "q_curation_ledger" -> CurationLedgerOracleSql,
    // waterfall: conditional counts over the nested ledger, one UNION ALL
    // row per stage with first-failing-stage attribution
    "q_curation_waterfall" ->
      s"""WITH led AS (SELECT * FROM ($CurationLedgerOracleSql) lx),
         |ag AS (
         |  SELECT count(*) AS n_total,
         |    CAST(sum(CASE WHEN is_bench THEN 1 ELSE 0 END) AS BIGINT) AS d1,
         |    CAST(sum(CASE WHEN NOT is_bench AND NOT g_quality THEN 1 ELSE 0 END) AS BIGINT) AS d2,
         |    CAST(sum(CASE WHEN NOT is_bench AND g_quality AND NOT g_repetition
         |                  THEN 1 ELSE 0 END) AS BIGINT) AS d3,
         |    CAST(sum(CASE WHEN NOT is_bench AND g_quality AND g_repetition
         |                       AND is_exact_dup THEN 1 ELSE 0 END) AS BIGINT) AS d4,
         |    CAST(sum(CASE WHEN NOT is_bench AND g_quality AND g_repetition
         |                       AND NOT is_exact_dup AND is_contaminated
         |                  THEN 1 ELSE 0 END) AS BIGINT) AS d5
         |  FROM led)
         |SELECT 1 AS stage_order, 'bench_holdout' AS stage,
         |       n_total AS n_in, d1 AS n_dropped, n_total - d1 AS n_out FROM ag
         |UNION ALL SELECT 2, 'quality_gates', n_total - d1, d2,
         |       n_total - d1 - d2 FROM ag
         |UNION ALL SELECT 3, 'repetition_gates', n_total - d1 - d2, d3,
         |       n_total - d1 - d2 - d3 FROM ag
         |UNION ALL SELECT 4, 'exact_dedup', n_total - d1 - d2 - d3, d4,
         |       n_total - d1 - d2 - d3 - d4 FROM ag
         |UNION ALL SELECT 5, 'decontamination', n_total - d1 - d2 - d3 - d4, d5,
         |       n_total - d1 - d2 - d3 - d4 - d5 FROM ag""".stripMargin,
    "q_curation_report" ->
      s"""WITH t AS (SELECT doc_id, $TokensSql AS ws, md5(text) AS h FROM documents),
         |shs AS (SELECT doc_id, list_distinct(
         |    CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
         |         ELSE list_transform(generate_series(1, len(ws) - 2),
         |                             i -> array_to_string(ws[i:i+2], ' '))
         |    END) AS sh FROM t),
         |tr AS (SELECT doc_id, unnest(sh) AS s FROM shs WHERE doc_id % 20 <> 0),
         |be AS (SELECT doc_id AS bench_id, unnest(sh) AS s FROM shs WHERE doc_id % 20 = 0),
         |cont AS (SELECT DISTINCT doc_id FROM (
         |  SELECT tr.doc_id FROM tr JOIN be USING (s)
         |  GROUP BY tr.doc_id, be.bench_id HAVING count(*) >= 2)),
         |m AS (SELECT doc_id, h, min(doc_id) OVER (PARTITION BY h) AS h_min,
         |             CASE WHEN len(ws) = 0 THEN 0.0
         |                  ELSE 1 - CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws)
         |             END AS dwf,
         |             len(ws) AS nt
         |      FROM t)
         |SELECT doc_id,
         |       doc_id % 20 = 0 AS is_bench,
         |       doc_id <> h_min AS is_dup,
         |       CAST(nt AS BIGINT) AS n_tokens,
         |       round(dwf, 6) AS dup_word_frac,
         |       doc_id IN (SELECT doc_id FROM cont) AS contaminated,
         |       (doc_id % 20 <> 0 AND doc_id = h_min AND nt >= 20 AND dwf <= 0.6
         |        AND doc_id NOT IN (SELECT doc_id FROM cont)) AS keep
         |FROM m""".stripMargin,
    // same shingle construction as q_neardup_verify's oracle (proven ≡ the
    // native ShingleSet kernel)
    "q_decontaminate" -> DecontaminateSql,
    // distinct benchmark shingle set, semi-join count per training doc
    "q_decontaminate_frac" ->
      s"""WITH t AS (
         |  SELECT doc_id, $TokensSql AS toks FROM documents
         |), d AS (
         |  SELECT doc_id, list_distinct(
         |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
         |         ELSE list_transform(generate_series(1, len(toks) - 2),
         |                             i -> array_to_string(toks[i:i+2], ' '))
         |    END) AS sh
         |  FROM t),
         |tr AS (SELECT doc_id, unnest(sh) AS s FROM d WHERE doc_id % 20 <> 0),
         |bs AS (SELECT DISTINCT unnest(sh) AS s FROM d WHERE doc_id % 20 = 0),
         |tot AS (SELECT doc_id, count(*) AS n_shingles FROM tr GROUP BY doc_id),
         |hit AS (SELECT tr.doc_id, count(*) AS n_hit
         |        FROM tr JOIN bs ON tr.s = bs.s GROUP BY tr.doc_id)
         |SELECT tot.doc_id, CAST(tot.n_shingles AS BIGINT) AS n_shingles,
         |       CAST(COALESCE(hit.n_hit, 0) AS BIGINT) AS n_hit,
         |       round(CAST(COALESCE(hit.n_hit, 0) AS DOUBLE) / tot.n_shingles, 6)
         |         AS contamination_frac
         |FROM tot LEFT JOIN hit ON tot.doc_id = hit.doc_id""".stripMargin,
    // the self-join spelling is affordable at verify scale and is the
    // independent oracle for the set-explode Spark shape
    "q_source_overlap" ->
      s"""WITH t AS (
         |  SELECT doc_id, source, $TokensSql AS toks FROM documents
         |), d AS (
         |  SELECT source, unnest(list_distinct(
         |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
         |         ELSE list_transform(generate_series(1, len(toks) - 2),
         |                             i -> array_to_string(toks[i:i+2], ' '))
         |    END)) AS s
         |  FROM t),
         |ss AS (SELECT DISTINCT source, s FROM d)
         |SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared
         |FROM ss a JOIN ss b ON a.s = b.s AND a.source < b.source
         |GROUP BY a.source, b.source""".stripMargin,
    // the Bloom path has no false negatives and exact-verifies the rest, so
    // its output is IDENTICAL to the broadcast path — same oracle
    "q_decontaminate_bloom" -> DecontaminateSql,
    "q_group_cap" ->
      """WITH r AS (
        |  SELECT doc_id, lang,
        |         row_number() OVER (PARTITION BY lang
        |                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
        |           AS samp_rank
        |  FROM documents)
        |SELECT doc_id, lang, samp_rank FROM r WHERE samp_rank <= 50""".stripMargin,
    // WFQ training order: md5 per-source ranks, in-plan temperature
    // weights (identical pow/floor spelling), integer virtual times
    // (both operands positive so DIV ≡ //), global row_number twin of
    // the PrefixSum rank
    "q_training_order" ->
      """WITH c AS (SELECT source, count(*) AS ns FROM documents GROUP BY source),
        |t AS (SELECT count(*) AS n FROM documents),
        |w AS (SELECT source,
        |         CAST(floor(pow(CAST(ns AS DOUBLE) / CAST(n AS DOUBLE), 0.5)
        |                    * 1000000.0 + 0.5) AS BIGINT) AS w_micros
        |       FROM c CROSS JOIN t),
        |r AS (SELECT doc_id, source,
        |        CAST(row_number() OVER (PARTITION BY source
        |                           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
        |             AS BIGINT) AS src_rank
        |      FROM documents),
        |v AS (SELECT r.doc_id, r.source, r.src_rank, w.w_micros,
        |             (r.src_rank * 1000000000) // w.w_micros AS vtime
        |      FROM r JOIN w USING (source))
        |SELECT doc_id, source, src_rank, w_micros, vtime,
        |       CAST(row_number() OVER (ORDER BY vtime, source, doc_id) AS BIGINT)
        |         AS global_pos
        |FROM v""".stripMargin,
    // the classic 16->32 bit-spread chain, spelled with the same masks as
    // ZOrder.spread16 (DuckDB BIGINT <<,|,& match Spark's long ops exactly)
    "q_zorder_key" ->
      """WITH b AS (
        |  SELECT l_orderkey, l_linenumber,
        |         l_partkey % 65536 AS x0, l_suppkey % 65536 AS y0
        |  FROM lineitem),
        |s1 AS (SELECT l_orderkey, l_linenumber,
        |         ((x0 | (x0 << 8)) & 16711935) AS x1,
        |         ((y0 | (y0 << 8)) & 16711935) AS y1 FROM b),
        |s2 AS (SELECT l_orderkey, l_linenumber,
        |         ((x1 | (x1 << 4)) & 252645135) AS x2,
        |         ((y1 | (y1 << 4)) & 252645135) AS y2 FROM s1),
        |s3 AS (SELECT l_orderkey, l_linenumber,
        |         ((x2 | (x2 << 2)) & 858993459) AS x3,
        |         ((y2 | (y2 << 2)) & 858993459) AS y3 FROM s2),
        |s4 AS (SELECT l_orderkey, l_linenumber,
        |         ((x3 | (x3 << 1)) & 1431655765) AS x4,
        |         ((y3 | (y3 << 1)) & 1431655765) AS y4 FROM s3)
        |SELECT l_orderkey, l_linenumber, (x4 | (y4 << 1)) AS zkey FROM s4""".stripMargin,
    // the shared md5-48 spelling, argmax via row_number(h DESC, shard)
    "q_rendezvous_shards" ->
      """WITH sh10 AS (SELECT unnest(generate_series(0, 9)) AS shard),
        |sh11 AS (SELECT unnest(generate_series(0, 10)) AS shard),
        |a10 AS (
        |  SELECT doc_id, shard AS s10 FROM (
        |    SELECT d.doc_id, s.shard,
        |           ('0x' || substring(md5(CAST(s.shard AS VARCHAR) || '_'
        |                || CAST(d.doc_id AS VARCHAR)), 1, 12))::BIGINT AS h
        |    FROM documents d CROSS JOIN sh10 s)
        |  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, shard) = 1),
        |a11 AS (
        |  SELECT doc_id, shard AS s11 FROM (
        |    SELECT d.doc_id, s.shard,
        |           ('0x' || substring(md5(CAST(s.shard AS VARCHAR) || '_'
        |                || CAST(d.doc_id AS VARCHAR)), 1, 12))::BIGINT AS h
        |    FROM documents d CROSS JOIN sh11 s)
        |  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, shard) = 1)
        |SELECT CAST(a10.s10 AS INT) AS shard, count(*) AS n,
        |       CAST(sum(CASE WHEN a10.s10 <> a11.s11 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_moved
        |FROM a10 JOIN a11 USING (doc_id)
        |GROUP BY a10.s10""".stripMargin,
    "q_snapshot_diff" ->
      """WITH a AS (SELECT doc_id, text FROM documents),
        |b AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
        |  FROM a WHERE doc_id % 11 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text || ' new' AS text
        |  FROM a WHERE doc_id % 13 = 0),
        |j AS (
        |  SELECT CASE WHEN ah.h IS NULL THEN 'added'
        |              WHEN bh.h IS NULL THEN 'removed'
        |              WHEN ah.h = bh.h THEN 'unchanged'
        |              ELSE 'changed' END AS status
        |  FROM (SELECT doc_id, md5(text) AS h FROM a) ah
        |  FULL OUTER JOIN (SELECT doc_id, md5(text) AS h FROM b) bh
        |    ON ah.doc_id = bh.doc_id)
        |SELECT status, count(*) AS n FROM j GROUP BY status""".stripMargin,
    "q_zipf_by_source" ->
      s"""WITH toks AS (SELECT source, unnest($TokensSql) AS w FROM documents),
         |wc AS (SELECT source, w, count(*) AS n FROM toks GROUP BY source, w),
         |r AS (SELECT source, n,
         |             row_number() OVER (PARTITION BY source ORDER BY n DESC, w) AS rk
         |      FROM wc QUALIFY rk <= 100),
         |q AS (SELECT source,
         |             CAST(floor(ln(rk) * 1000000.0 + 0.5) AS BIGINT) AS x,
         |             CAST(floor(ln(n) * 1000000.0 + 0.5) AS BIGINT) AS y FROM r),
         |a AS (SELECT source, count(*) AS nw, CAST(sum(x) AS BIGINT) AS sx,
         |             CAST(sum(y) AS BIGINT) AS sy,
         |             CAST(sum(x * y) AS BIGINT) AS sxy,
         |             CAST(sum(x * x) AS BIGINT) AS sxx FROM q GROUP BY source)
         |SELECT source, nw, nw * sxy - sx * sy AS num, nw * sxx - sx * sx AS den,
         |       CASE WHEN nw * sxx - sx * sx = 0 THEN 0.0
         |            ELSE floor(CAST(nw * sxy - sx * sy AS DOUBLE)
         |                 / CAST(nw * sxx - sx * sx AS DOUBLE) * 1000000.0 + 0.5)
         |                 / 1000000.0 END AS slope
         |FROM a""".stripMargin,
    // the q_zipf_by_source chain keyed by the 8 doc-order slices, slope
    // as e6 BIGINT, drift via lag over the 8 slice rows
    "q_zipf_drift" ->
      s"""WITH nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
         |toks AS (SELECT doc_id * 8 // n_docs AS win, unnest($TokensSql) AS w
         |         FROM documents CROSS JOIN nd),
         |wc AS (SELECT win, w, count(*) AS n FROM toks GROUP BY win, w),
         |r AS (SELECT win, n,
         |             row_number() OVER (PARTITION BY win ORDER BY n DESC, w) AS rk
         |      FROM wc QUALIFY rk <= 100),
         |q AS (SELECT win, CAST(floor(ln(rk) * 1000000.0 + 0.5) AS BIGINT) AS x,
         |             CAST(floor(ln(n) * 1000000.0 + 0.5) AS BIGINT) AS y FROM r),
         |a AS (SELECT win, count(*) AS nw, CAST(sum(x) AS BIGINT) AS sx,
         |             CAST(sum(y) AS BIGINT) AS sy,
         |             CAST(sum(x * y) AS BIGINT) AS sxy,
         |             CAST(sum(x * x) AS BIGINT) AS sxx FROM q GROUP BY win),
         |sl AS (SELECT win, nw,
         |         CASE WHEN nw * sxx - sx * sx = 0 THEN CAST(0 AS BIGINT)
         |              ELSE CAST(floor(CAST(nw * sxy - sx * sy AS DOUBLE)
         |                   / CAST(nw * sxx - sx * sx AS DOUBLE) * 1000000.0 + 0.5)
         |                   AS BIGINT)
         |         END AS slope_e6
         |       FROM a)
         |SELECT win, nw, slope_e6,
         |       slope_e6 - lag(slope_e6, 1) OVER (ORDER BY win) AS drift_e6
         |FROM sl""".stripMargin,
    // same micro-quantized ln terms, exact integer sums, one replayed
    // floor-6 division
    "q_zipf_slope" ->
      s"""WITH toks AS (SELECT unnest($TokensSql) AS w FROM documents),
         |wc AS (SELECT w, count(*) AS n FROM toks GROUP BY w),
         |top AS (SELECT w, n FROM wc ORDER BY n DESC, w LIMIT 100),
         |r AS (SELECT n, row_number() OVER (ORDER BY n DESC, w) AS rk FROM top),
         |q AS (SELECT CAST(floor(ln(rk) * 1000000.0 + 0.5) AS BIGINT) AS x,
         |             CAST(floor(ln(n) * 1000000.0 + 0.5) AS BIGINT) AS y FROM r),
         |a AS (SELECT count(*) AS nw, CAST(sum(x) AS BIGINT) AS sx,
         |             CAST(sum(y) AS BIGINT) AS sy,
         |             CAST(sum(x * y) AS BIGINT) AS sxy,
         |             CAST(sum(x * x) AS BIGINT) AS sxx FROM q)
         |SELECT nw, nw * sxy - sx * sy AS num, nw * sxx - sx * sx AS den,
         |       CASE WHEN nw * sxx - sx * sx = 0 THEN 0.0
         |            ELSE floor(CAST(nw * sxy - sx * sy AS DOUBLE)
         |                 / CAST(nw * sxx - sx * sx AS DOUBLE) * 1000000.0 + 0.5)
         |                 / 1000000.0 END AS slope
         |FROM a""".stripMargin,
    "q_blocklist_filter" ->
      s"""WITH t AS (SELECT doc_id, $TokensSql AS toks FROM documents)
         |SELECT doc_id, len(toks) AS n_tokens,
         |       len(list_filter(toks, x -> x IN ('slow', 'big'))) AS n_hits,
         |       len(list_filter(toks, x -> x IN ('slow', 'big'))) = 0 AS keep
         |FROM t""".stripMargin,
    "q_temporal_split" ->
      """WITH ev AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM events),
        |b AS (SELECT min(ts_s) AS t0, max(ts_s) AS t1 FROM ev),
        |s AS (
        |  SELECT ts_s,
        |         CASE WHEN ts_s < t0 + (t1 - t0) * 8 // 10 THEN 'train'
        |              WHEN ts_s < t0 + (t1 - t0) * 8 // 10 + 3600 THEN 'embargo'
        |              ELSE 'test' END AS split
        |  FROM ev CROSS JOIN b)
        |SELECT split, count(*) AS n, min(ts_s) AS min_ts_s, max(ts_s) AS max_ts_s
        |FROM s GROUP BY split""".stripMargin,
    // same md5 first-2-hex ascii arithmetic as q_hash_split, mod k
    "q_kfold_assign" ->
      """WITH b AS (
        |  SELECT user_id,
        |         ((CASE WHEN ascii(substring(md5(CAST(user_id AS VARCHAR)), 1, 1)) >= 97
        |                THEN ascii(substring(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 87
        |                ELSE ascii(substring(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 48 END) * 16
        |        + (CASE WHEN ascii(substring(md5(CAST(user_id AS VARCHAR)), 2, 1)) >= 97
        |                THEN ascii(substring(md5(CAST(user_id AS VARCHAR)), 2, 1)) - 87
        |                ELSE ascii(substring(md5(CAST(user_id AS VARCHAR)), 2, 1)) - 48 END)) % 5
        |           AS fold
        |  FROM events)
        |SELECT fold, count(DISTINCT user_id) AS n_users, count(*) AS n_events
        |FROM b GROUP BY fold""".stripMargin,
    // same 3-shingle spelling as EdgesCte; windowed BIGINT sum cast per
    // the HUGEINT gotcha
    "q_vocab_growth" ->
      s"""WITH t AS (SELECT doc_id, $TokensSql AS toks FROM documents),
         |d AS (
         |  SELECT doc_id, list_distinct(
         |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
         |         ELSE list_transform(generate_series(1, len(toks) - 2),
         |                             i -> array_to_string(toks[i:i+2], ' '))
         |    END) AS sh
         |  FROM t),
         |tot AS (SELECT count(*) AS n_docs FROM documents),
         |ex AS (SELECT doc_id * 10 // (SELECT n_docs FROM tot) AS decile,
         |              unnest(sh) AS s
         |       FROM d),
         |f AS (SELECT s, min(decile) AS first_decile FROM ex GROUP BY s),
         |g AS (SELECT first_decile, count(*) AS n_new FROM f GROUP BY 1)
         |SELECT first_decile, n_new,
         |       CAST(sum(n_new) OVER (ORDER BY first_decile
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |         AS cum_distinct
         |FROM g""".stripMargin,
    // the same shingle spelling partitioned by source; deciles from the
    // per-source doc rank ((rk−1)·10 // nsrc — non-negative, so // ≡ DIV)
    "q_vocab_growth_by_source" ->
      s"""WITH t AS (SELECT source, doc_id, $TokensSql AS toks FROM documents),
         |d AS (
         |  SELECT source, doc_id, list_distinct(
         |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
         |         ELSE list_transform(generate_series(1, len(toks) - 2),
         |                             i -> array_to_string(toks[i:i+2], ' '))
         |    END) AS sh
         |  FROM t),
         |r AS (SELECT source, sh,
         |             row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rk,
         |             count(*) OVER (PARTITION BY source) AS nsrc
         |      FROM d),
         |ex AS (SELECT source, (rk - 1) * 10 // nsrc AS decile, unnest(sh) AS s
         |       FROM r),
         |f AS (SELECT source, s, min(decile) AS first_decile
         |      FROM ex GROUP BY source, s),
         |g AS (SELECT source, first_decile, count(*) AS n_new
         |      FROM f GROUP BY source, first_decile)
         |SELECT source, first_decile, n_new,
         |       CAST(sum(n_new) OVER (PARTITION BY source ORDER BY first_decile
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |         AS cum_distinct
         |FROM g""".stripMargin,
    // zkey via the generated bit-term spelling (≡ the unrolled spread
    // chain), then row_number files per layout, zone maps, and the same
    // pruned-interval test per predicate
    "q_zonemap_pruning" -> {
      val zterms = (for {
        (c, j) <- Seq("l_partkey", "l_suppkey").zipWithIndex
        i <- 0 until 16
      } yield s"((((CAST($c AS BIGINT) % 65536) >> $i) & 1) << ${i * 2 + j})").mkString(" | ")
      s"""WITH z AS (
         |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         |         ($zterms) AS zkey
         |  FROM lineitem),
         |rn AS (
         |  SELECT l_partkey, l_suppkey,
         |         (row_number() OVER (ORDER BY l_orderkey, l_linenumber) - 1) // 1000
         |           AS f_nat,
         |         (row_number() OVER (ORDER BY zkey, l_orderkey, l_linenumber) - 1) // 1000
         |           AS f_z
         |  FROM z),
         |fn AS (SELECT f_nat AS file_id, min(l_partkey) AS mnp, max(l_partkey) AS mxp,
         |              min(l_suppkey) AS mns, max(l_suppkey) AS mxs
         |       FROM rn GROUP BY f_nat),
         |fz AS (SELECT f_z AS file_id, min(l_partkey) AS mnp, max(l_partkey) AS mxp,
         |              min(l_suppkey) AS mns, max(l_suppkey) AS mxs
         |       FROM rn GROUP BY f_z),
         |bothf AS (SELECT 'natural' AS layout, * FROM fn
         |          UNION ALL SELECT 'zorder', * FROM fz),
         |pr AS (
         |  SELECT layout, p.pred,
         |         CASE p.pred
         |           WHEN 'partkey_100_150' THEN (mxp < 100 OR mnp > 150)
         |           WHEN 'suppkey_1_5' THEN (mxs < 1 OR mns > 5)
         |           WHEN 'partkey_point_77' THEN (mxp < 77 OR mnp > 77)
         |         END AS pruned
         |  FROM bothf CROSS JOIN (VALUES ('partkey_100_150'), ('suppkey_1_5'),
         |                                ('partkey_point_77')) p(pred))
         |SELECT layout, pred, count(*) AS n_files,
         |       CAST(sum(CASE WHEN pruned THEN 1 ELSE 0 END) AS BIGINT) AS n_pruned,
         |       CAST(sum(CASE WHEN pruned THEN 1 ELSE 0 END) AS BIGINT) * 1000000
         |         // count(*) AS pruned_micros
         |FROM pr GROUP BY layout, pred""".stripMargin
    },
    // same bit-by-bit interleave as ZOrder.zkeyN, generated term-for-term
    // (TPC-H keys are non-negative, so DuckDB % equals Spark pmod)
    "q_zorder3_key" -> {
      val terms = for {
        (c, j) <- Seq("l_partkey", "l_suppkey", "l_linenumber").zipWithIndex
        i <- 0 until 16
      } yield s"((((CAST($c AS BIGINT) % 65536) >> $i) & 1) << ${i * 3 + j})"
      s"""SELECT l_orderkey, l_linenumber,
         |       (${terms.mkString(" | ")}) AS zkey3
         |FROM lineitem""".stripMargin
    },
    // the identical unrolled xy2d chain, one CTE per bit level (generated
    // like q_zorder3_key's terms); within a CTE the x/y/d aliases on the
    // SELECT items still read the INPUT row, exactly like the Spark
    // level projections reading the previous level's columns
    "q_hilbert_key" -> {
      val lvls = (15 to 0 by -1).zipWithIndex.map { case (k, i) =>
        s"""h${i + 1} AS (
           |  SELECT l_orderkey, l_linenumber,
           |    CASE WHEN ((y >> $k) & 1) = 1 THEN x
           |         WHEN ((x >> $k) & 1) = 1 THEN 65535 - y ELSE y END AS x,
           |    CASE WHEN ((y >> $k) & 1) = 1 THEN y
           |         WHEN ((x >> $k) & 1) = 1 THEN 65535 - x ELSE x END AS y,
           |    d + (xor(((x >> $k) & 1) * 3, (y >> $k) & 1) << ${2 * k}) AS d
           |  FROM h$i)""".stripMargin
      }
      s"""WITH h0 AS (
         |  SELECT l_orderkey, l_linenumber,
         |         CAST(l_partkey % 65536 AS BIGINT) AS x,
         |         CAST(l_suppkey % 65536 AS BIGINT) AS y,
         |         CAST(0 AS BIGINT) AS d
         |  FROM lineitem),
         |${lvls.mkString(",\n")}
         |SELECT l_orderkey, l_linenumber, d AS hkey FROM h16""".stripMargin
    },
    // w = round(pow(n/N, 0.5), 6) exactly as Mixture.temperatureWeights
    // rounds, so the quota arithmetic downstream is engine-identical
    "q_mixture_temperature" ->
      """WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
        |t AS (SELECT CAST(sum(n) AS DOUBLE) AS tot FROM c),
        |w AS (SELECT source, n, round(pow(n / tot, 0.5), 6) AS wt FROM c, t),
        |s AS (SELECT min(n / wt) AS scale FROM w),
        |q AS (SELECT source, CAST(floor(wt * scale) AS BIGINT) AS keep_n FROM w, s),
        |r AS (SELECT doc_id, source,
        |        row_number() OVER (PARTITION BY source
        |                           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
        |          AS samp_rank
        |      FROM documents)
        |SELECT r.doc_id, r.source, CAST(r.samp_rank AS BIGINT) AS samp_rank, q.keep_n
        |FROM r JOIN q USING (source) WHERE r.samp_rank <= q.keep_n""".stripMargin,
    // Efraimidis–Spirakis with a 48-bit md5-derived uniform: the +0.5 and
    // the /2^48 are exact in doubles, so both engines compute the same u;
    // ln/division agree to the ulp on identical inputs and ties break on
    // doc_id
    "q_weighted_sample" ->
      """WITH r AS (
        |  SELECT doc_id, source,
        |         row_number() OVER (PARTITION BY source ORDER BY
        |           -ln((('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
        |                + 0.5) / 281474976710656.0)
        |             / CAST(n_chars + 1 AS DOUBLE),
        |           doc_id) AS es_rank
        |  FROM documents)
        |SELECT doc_id, source, CAST(es_rank AS BIGINT) AS es_rank
        |FROM r WHERE es_rank <= 20""".stripMargin,
    "q_pii_scrub" ->
      """WITH s AS (
        |  SELECT doc_id,
        |         text || ' contact: user' || CAST(doc_id AS VARCHAR)
        |              || '@example.com http://site' || CAST(doc_id AS VARCHAR)
        |              || '.org 10.0.0.' || CAST(doc_id % 256 AS VARCHAR) AS t
        |  FROM documents)
        |SELECT doc_id,
        |       len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |         AS n_emails,
        |       len(regexp_extract_all(t, 'https?://[^\s]+')) AS n_urls,
        |       len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ips,
        |       length(regexp_replace(regexp_replace(regexp_replace(t,
        |                'https?://[^\s]+', '<URL>', 'g'),
        |                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |                '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'))
        |         AS redacted_len
        |FROM s""".stripMargin,
    // same spike derivation + the Luhn fold term for term (rightmost digit
    // weight 1, every second digit doubled with digit-sum)
    "q_pii_scrub2" ->
      """WITH s AS (
        |  SELECT doc_id,
        |         text || ' ph (5' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
        |              || ') 555-01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
        |              || ' card 4' || lpad(CAST(doc_id AS VARCHAR), 15, '0')
        |              || ' alt 5' || lpad(CAST(doc_id * 3 + 1 AS VARCHAR), 15, '0') AS t
        |  FROM documents)
        |SELECT doc_id,
        |       len(regexp_extract_all(t, '\(\d{3}\) \d{3}-\d{4}')) AS n_phones,
        |       len(regexp_extract_all(t, '\b\d{13,19}\b')) AS n_card_candidates,
        |       len(list_filter(regexp_extract_all(t, '\b\d{13,19}\b'),
        |         c -> list_sum(list_transform(generate_series(1, length(c)),
        |              i -> CASE WHEN (length(c) - i) % 2 = 1
        |                   THEN CASE WHEN CAST(substring(c, i, 1) AS INT) * 2 > 9
        |                        THEN CAST(substring(c, i, 1) AS INT) * 2 - 9
        |                        ELSE CAST(substring(c, i, 1) AS INT) * 2 END
        |                   ELSE CAST(substring(c, i, 1) AS INT) END)) % 10 = 0))
        |         AS n_cards_valid,
        |       length(regexp_replace(regexp_replace(t,
        |                '\b\d{13,19}\b', '<CARD>', 'g'),
        |                '\(\d{3}\) \d{3}-\d{4}', '<PHONE>', 'g')) AS redacted_len
        |FROM s""".stripMargin,
    // same spike via chr() codepoints (DuckDB literals don't process \u
    // escapes); nfc_normalize implements the same UAX #15 tables
    "q_normalize_text" ->
      """WITH s AS (
        |  SELECT doc_id,
        |         text || CASE doc_id % 3
        |           WHEN 0 THEN ' cafe' || chr(769) || ' A' || chr(778)
        |                       || 'ngstro' || chr(776) || 'm'
        |           WHEN 1 THEN ' caf' || chr(233)
        |           ELSE ' plain' END AS t
        |  FROM documents)
        |SELECT doc_id, nfc_normalize(t) AS norm_text,
        |       nfc_normalize(t) <> t AS changed,
        |       length(t) AS len_raw,
        |       length(nfc_normalize(t)) AS len_norm
        |FROM s""".stripMargin,
    // per-key histograms collapse to 1-row summaries; identical floor
    // divisions for the micros fractions and the salt ceiling
    "q_skew_profile" ->
      """WITH s AS (
        |  SELECT 'user_id' AS key_col, CAST(sum(c) AS BIGINT) AS n_rows,
        |         count(*) AS n_keys, max(c) AS max_key_rows
        |  FROM (SELECT count(*) AS c FROM events GROUP BY user_id)
        |  UNION ALL
        |  SELECT 'event_type', CAST(sum(c) AS BIGINT), count(*), max(c)
        |  FROM (SELECT count(*) AS c FROM events GROUP BY event_type))
        |SELECT key_col, n_rows, n_keys, max_key_rows,
        |       n_rows * 1000000 // n_keys AS avg_rows_micros,
        |       max_key_rows * 1000000 // greatest(n_rows // n_keys, 1) AS skew_micros,
        |       (max_key_rows + 999) // 1000 AS salt_factor
        |FROM s""".stripMargin,
    // same injected violations, one UNION ALL branch per constraint; the
    // fraction is exact integer floor-division on both engines
    "q_dq_report" ->
      """WITH dirty AS (
        |  SELECT CASE WHEN event_id % 101 = 0 THEN 0 ELSE event_id END AS event_id,
        |         CASE WHEN event_id % 97 = 0 THEN NULL ELSE user_id END AS user_id,
        |         CASE WHEN event_id % 89 = 0 THEN user_id + 10000000 ELSE user_id END
        |           AS fk_user_id,
        |         CASE WHEN event_id % 71 = 0 THEN upper(event_type) ELSE event_type END
        |           AS event_type,
        |         CASE WHEN event_id % 53 = 0 THEN -value - 1.0 ELSE value END AS value
        |  FROM events),
        |base AS (
        |  SELECT 'complete_user_id' AS check_name,
        |         CAST(count(*) FILTER (WHERE user_id IS NULL) AS BIGINT) AS n_bad,
        |         count(*) AS n_total FROM dirty
        |  UNION ALL
        |  SELECT 'value_nonnegative',
        |         CAST(count(*) FILTER (WHERE value < 0.0) AS BIGINT), count(*) FROM dirty
        |  UNION ALL
        |  SELECT 'event_type_domain',
        |         CAST(count(*) FILTER (WHERE event_type NOT IN
        |           ('view', 'click', 'purchase', 'signup', 'error')) AS BIGINT),
        |         count(*) FROM dirty
        |  UNION ALL
        |  SELECT 'unique_event_id',
        |         CAST(count(event_id) - count(DISTINCT event_id) AS BIGINT),
        |         count(*) FROM dirty
        |  UNION ALL
        |  SELECT 'fk_user_customer',
        |         (SELECT CAST(count(*) AS BIGINT) FROM dirty d
        |          WHERE d.fk_user_id IS NOT NULL AND NOT EXISTS
        |            (SELECT 1 FROM customer c WHERE c.c_custkey = d.fk_user_id)),
        |         count(*) FROM dirty)
        |SELECT check_name, n_bad, n_total,
        |       n_bad * 1000000 // n_total AS bad_micros,
        |       n_bad = 0 AS passed
        |FROM base""".stripMargin,
    // same ascii arithmetic as HashSplit.bucket — md5 hex is the one hash
    // spelling engines agree on
    "q_hash_split" ->
      """WITH h AS (SELECT doc_id, md5(text) AS h FROM documents),
        |b AS (
        |  SELECT doc_id,
        |         (CASE WHEN ascii(substring(h, 1, 1)) >= 97
        |               THEN ascii(substring(h, 1, 1)) - 87
        |               ELSE ascii(substring(h, 1, 1)) - 48 END) * 16
        |       + (CASE WHEN ascii(substring(h, 2, 1)) >= 97
        |               THEN ascii(substring(h, 2, 1)) - 87
        |               ELSE ascii(substring(h, 2, 1)) - 48 END) AS bucket
        |  FROM h)
        |SELECT doc_id, bucket,
        |       CASE WHEN bucket < 205 THEN 'train'
        |            WHEN bucket < 230 THEN 'val' ELSE 'test' END AS split
        |FROM b""".stripMargin,
    "q_semdedup_subset" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |                  CAST(vec_id % 50 AS INT) AS c
        |           FROM embeddings)
        |SELECT a.vec_id AS id1, b.vec_id AS id2,
        |       round(list_cosine_similarity(a.v, b.v), 6) AS cos
        |FROM e a JOIN e b ON a.c = b.c AND a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.v, b.v) >= 0.2""".stripMargin,
    // repetition filters: dup fracs via list_distinct; top-word share via
    // unnest + per-word count (the oracle may shuffle — the Spark side is a
    // zero-shuffle projection, which is the point)
    "q_repetition_scores" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         list_filter(regexp_split_to_array(lower(text), '\s+'), w -> w <> '') AS ws,
        |         list_filter(string_split(text, chr(10)), l -> l <> '') AS ls
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, ws, ls,
        |         list_transform(generate_series(1, len(ws) - 1),
        |                        i -> ws[i] || ' ' || ws[i + 1]) AS bs
        |  FROM t),
        |top AS (
        |  SELECT doc_id, max(c) AS topc FROM (
        |    SELECT doc_id, w, count(*) AS c
        |    FROM (SELECT doc_id, unnest(ws) AS w FROM t) GROUP BY doc_id, w)
        |  GROUP BY doc_id)
        |SELECT b.doc_id, len(ws) AS n_words,
        |       round(CASE WHEN len(ws) = 0 THEN 0.0
        |                  ELSE 1 - CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) END, 6)
        |         AS dup_word_frac,
        |       round(CASE WHEN len(bs) = 0 THEN 0.0
        |                  ELSE 1 - CAST(len(list_distinct(bs)) AS DOUBLE) / len(bs) END, 6)
        |         AS dup_bigram_frac,
        |       round(CASE WHEN len(ls) = 0 THEN 0.0
        |                  ELSE 1 - CAST(len(list_distinct(ls)) AS DOUBLE) / len(ls) END, 6)
        |         AS dup_line_frac,
        |       round(coalesce(CAST(top.topc AS DOUBLE) / nullif(len(ws), 0), 0.0), 6)
        |         AS top_word_frac
        |FROM b LEFT JOIN top ON b.doc_id = top.doc_id""".stripMargin,
    // as-of semantics stated directly: the rn=1 row of all at-or-before
    // views (all-pairs per key is fine at oracle scale; the Spark side's
    // union-scan spelling is the one that scales). Micros on both sides:
    // DuckDB's parquet scan already truncated TIMESTAMP(NANOS) to micros,
    // so epoch_ns(ts) // 1000 is exact here, and the Spark side feeds
    // ts_ns DIV 1000 to the join so the time axes agree bit-for-bit.
    "q_asof_attribution" ->
      """WITH p AS (SELECT event_id AS purchase_id, user_id, epoch_ns(ts) // 1000 AS tus
        |           FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT event_id AS view_id, user_id, epoch_ns(ts) // 1000 AS tus
        |      FROM events WHERE event_type = 'view'),
        |j AS (
        |  SELECT p.purchase_id, p.user_id, v.view_id, p.tus - v.tus AS gap_us,
        |         row_number() OVER (PARTITION BY p.purchase_id
        |                            ORDER BY v.tus DESC, v.view_id DESC) AS rn
        |  FROM p LEFT JOIN v ON v.user_id = p.user_id AND v.tus <= p.tus)
        |SELECT purchase_id, user_id, view_id, gap_us FROM j WHERE rn = 1""".stripMargin,
    "q_dedup_exact" ->
      """SELECT md5(text) AS text_md5, min(doc_id) AS doc_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text)""".stripMargin,
    // the admission pipeline spelled stage by stage: exact md5 joins, then
    // the capped shingle candidate join + exact-Jaccard verify (all-int
    // output — no rounding anywhere)
    "q_incremental_dedup" ->
      s"""WITH b0 AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
         |  UNION ALL
         |  SELECT doc_id + 1000000, text FROM documents
         |  WHERE doc_id % 5 <> 0 AND doc_id % 11 = 3
         |  UNION ALL
         |  SELECT doc_id + 2000000, text FROM documents
         |  WHERE doc_id % 5 = 0 AND doc_id % 7 = 1
         |), c0 AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 0),
         |bh AS (SELECT doc_id, text, md5(text) AS h FROM b0),
         |cg AS (SELECT md5(text) AS h, min(doc_id) AS cmatch FROM c0 GROUP BY 1),
         |s1 AS (SELECT bh.doc_id, bh.text, bh.h, cg.cmatch FROM bh LEFT JOIN cg USING (h)),
         |bg AS (SELECT h, min(doc_id) AS brep FROM s1 WHERE cmatch IS NULL GROUP BY h),
         |s2 AS (SELECT s1.*, bg.brep FROM s1 LEFT JOIN bg USING (h)),
         |tb AS (SELECT doc_id, $TokensSql AS toks FROM s2
         |       WHERE cmatch IS NULL AND doc_id = brep),
         |db AS (SELECT doc_id, list_distinct(
         |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
         |         ELSE list_transform(generate_series(1, len(toks) - 2),
         |                             i -> array_to_string(toks[i:i+2], ' '))
         |    END) AS sh FROM tb),
         |tc AS (SELECT doc_id, $TokensSql AS toks FROM c0),
         |dc AS (SELECT doc_id, list_distinct(
         |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
         |         ELSE list_transform(generate_series(1, len(toks) - 2),
         |                             i -> array_to_string(toks[i:i+2], ' '))
         |    END) AS sh FROM tc),
         |cex AS (SELECT doc_id AS cid, unnest(sh) AS s FROM dc),
         |hot AS (SELECT s FROM cex GROUP BY s HAVING count(*) > 20),
         |cexf AS (SELECT cid, s FROM cex WHERE s NOT IN (SELECT s FROM hot)),
         |bex AS (SELECT doc_id, unnest(sh) AS s FROM db),
         |bexf AS (SELECT doc_id, s FROM bex WHERE s NOT IN (SELECT s FROM hot)),
         |cand AS (SELECT bexf.doc_id, cexf.cid FROM bexf JOIN cexf USING (s)
         |         GROUP BY 1, 2 HAVING count(*) >= 5),
         |ver AS (SELECT cand.doc_id, min(cand.cid) AS nmatch
         |        FROM cand JOIN db x ON x.doc_id = cand.doc_id
         |                  JOIN dc y ON y.doc_id = cand.cid
         |        WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
         |              / len(list_distinct(list_concat(x.sh, y.sh))) >= 0.5
         |        GROUP BY 1)
         |SELECT s2.doc_id,
         |  CASE WHEN s2.cmatch IS NOT NULL THEN 'corpus_exact'
         |       WHEN s2.doc_id <> s2.brep THEN 'batch_exact'
         |       WHEN ver.nmatch IS NOT NULL THEN 'corpus_near' ELSE 'kept' END AS decision,
         |  CASE WHEN s2.cmatch IS NOT NULL THEN s2.cmatch
         |       WHEN s2.doc_id <> s2.brep THEN s2.brep
         |       ELSE ver.nmatch END AS match_id
         |FROM s2 LEFT JOIN ver ON ver.doc_id = s2.doc_id""".stripMargin,
    "q_tfidf_top_terms" ->
      s"""WITH terms AS (
         |  SELECT doc_id, unnest($TokensSql) AS word FROM documents
         |), tf AS (
         |  SELECT doc_id, word, count(*) AS tf FROM terms GROUP BY doc_id, word
         |), df AS (
         |  SELECT word, count(*) AS df FROM tf GROUP BY word
         |), scored AS (
         |  SELECT tf.doc_id, tf.word, tf.tf * ln((SELECT count(*) FROM documents) * 1.0 / df.df)
         |           AS tfidf
         |  FROM tf JOIN df ON tf.word = df.word
         |), ranked AS (
         |  SELECT doc_id, word, tfidf,
         |         row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, word) AS rank
         |  FROM scored)
         |SELECT doc_id, rank, word, round(tfidf, 6) AS tfidf FROM ranked WHERE rank <= 3""".stripMargin,
    // BM25: float ops spelled term-for-term as Bm25.topDocs evaluates them
    // (k1+1, 1-b, avgdl division) so both engines run identical IEEE ops
    // on the exact integer tf/df/dl/N inputs; score round-6 BEFORE ranking.
    "q_bm25_top_docs" ->
      s"""WITH tok AS (
         |  SELECT doc_id, $TokensSql AS toks FROM documents
         |), stats AS (
         |  SELECT count(*) AS n, sum(len(toks)) AS tot FROM tok
         |), terms AS (
         |  SELECT doc_id, len(toks) AS dl, unnest(toks) AS word FROM tok
         |), tf AS (
         |  SELECT doc_id, dl, word, count(*) AS tf FROM terms GROUP BY doc_id, dl, word
         |), df AS (
         |  SELECT word, count(*) AS df FROM tf GROUP BY word
         |), q(query_id, word) AS (VALUES $Bm25ValuesSql
         |), qt AS (
         |  SELECT DISTINCT q.query_id, q.word,
         |         ln((CAST(stats.n AS DOUBLE) - df.df + CAST(0.5 AS DOUBLE))
         |            / (df.df + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE)) AS idf
         |  FROM q JOIN df ON q.word = df.word CROSS JOIN stats
         |), scored AS (
         |  SELECT qt.query_id, tf.doc_id,
         |         round(sum(
         |           qt.idf * (tf.tf * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE)))
         |           / (tf.tf + CAST(1.2 AS DOUBLE)
         |              * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)
         |                 + CAST(0.75 AS DOUBLE) * tf.dl
         |                   / (CAST(stats.tot AS DOUBLE) / stats.n)))), 6) AS score
         |  FROM tf JOIN qt ON tf.word = qt.word CROSS JOIN stats
         |  GROUP BY qt.query_id, tf.doc_id
         |), ranked AS (
         |  SELECT query_id, doc_id, score,
         |         row_number() OVER (PARTITION BY query_id
         |                            ORDER BY score DESC, doc_id) AS rank
         |  FROM scored)
         |SELECT query_id, rank, doc_id, score FROM ranked WHERE rank <= 10""".stripMargin,
    // hybrid RRF fusion: BM25 chain with per-term floor-micro quantization
    // BEFORE the per-(query,doc) sum (exact BIGINT ranking — dozens of
    // terms per query-by-example probe is past the float-sum hazard), the
    // q_knn_bruteforce cosine chain, FULL JOIN, 1/(60+rank) in fixed
    // lex+dense order, one replayed floor-6 of the fused score
    "q_rrf_fusion" ->
      s"""WITH tok AS (
         |  SELECT doc_id, $TokensSql AS toks FROM documents
         |), stats AS (
         |  SELECT count(*) AS n, sum(len(toks)) AS tot FROM tok
         |), terms AS (
         |  SELECT doc_id, len(toks) AS dl, unnest(toks) AS word FROM tok
         |), tf AS (
         |  SELECT doc_id, dl, word, count(*) AS tf FROM terms GROUP BY doc_id, dl, word
         |), df AS (
         |  SELECT word, count(*) AS df FROM tf GROUP BY word
         |), q AS (
         |  SELECT doc_id AS query_id, unnest(list_distinct(toks)) AS word
         |  FROM tok WHERE doc_id < 5
         |), qt AS (
         |  SELECT DISTINCT q.query_id, q.word,
         |         ln((CAST(stats.n AS DOUBLE) - df.df + CAST(0.5 AS DOUBLE))
         |            / (df.df + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE)) AS idf
         |  FROM q JOIN df ON q.word = df.word CROSS JOIN stats
         |), lexs AS (
         |  SELECT qt.query_id, tf.doc_id,
         |         sum(CAST(floor(
         |           qt.idf * (tf.tf * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE)))
         |           / (tf.tf + CAST(1.2 AS DOUBLE)
         |              * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)
         |                 + CAST(0.75 AS DOUBLE) * tf.dl
         |                   / (CAST(stats.tot AS DOUBLE) / stats.n)))
         |           * 1000000.0 + 0.5) AS BIGINT)) AS lex_micros
         |  FROM tf JOIN qt ON tf.word = qt.word CROSS JOIN stats
         |  WHERE tf.doc_id <> qt.query_id
         |  GROUP BY qt.query_id, tf.doc_id
         |), lexr AS (
         |  SELECT query_id, doc_id,
         |         row_number() OVER (PARTITION BY query_id
         |                            ORDER BY lex_micros DESC, doc_id) AS lex_rank
         |  FROM lexs
         |  QUALIFY lex_rank <= 20
         |), dq AS (
         |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
         |  FROM embeddings WHERE vec_id < 5
         |), dc AS (
         |  SELECT dq.query_id, e.vec_id AS doc_id,
         |         list_cosine_similarity(dq.qv, CAST(e.embedding AS DOUBLE[])) AS cos
         |  FROM dq CROSS JOIN embeddings e WHERE e.vec_id <> dq.query_id
         |), dr AS (
         |  SELECT query_id, doc_id,
         |         row_number() OVER (PARTITION BY query_id
         |                            ORDER BY cos DESC, doc_id) AS dense_rank
         |  FROM dc
         |  QUALIFY dense_rank <= 20
         |), fused AS (
         |  SELECT coalesce(l.query_id, d.query_id) AS query_id,
         |         coalesce(l.doc_id, d.doc_id) AS doc_id,
         |         l.lex_rank, d.dense_rank,
         |         floor(((CASE WHEN l.lex_rank IS NULL THEN CAST(0.0 AS DOUBLE)
         |                 ELSE CAST(1.0 AS DOUBLE) / (CAST(60.0 AS DOUBLE) + l.lex_rank) END)
         |              + (CASE WHEN d.dense_rank IS NULL THEN CAST(0.0 AS DOUBLE)
         |                 ELSE CAST(1.0 AS DOUBLE) / (CAST(60.0 AS DOUBLE) + d.dense_rank) END))
         |               * 1000000.0 + 0.5) / 1000000.0 AS rrf_score
         |  FROM lexr l FULL OUTER JOIN dr d
         |    ON l.query_id = d.query_id AND l.doc_id = d.doc_id
         |), ranked AS (
         |  SELECT query_id, doc_id, rrf_score, lex_rank, dense_rank,
         |         row_number() OVER (PARTITION BY query_id
         |                            ORDER BY rrf_score DESC, doc_id) AS rank
         |  FROM fused)
         |SELECT query_id, CAST(rank AS INT) AS rank, doc_id, rrf_score,
         |       CAST(coalesce(lex_rank, 0) AS INT) AS lex_rank,
         |       CAST(coalesce(dense_rank, 0) AS INT) AS dense_rank
         |FROM ranked WHERE rank <= 10""".stripMargin,
    "q_pca_top_component" -> PcaOracleSql,
    "q_correlation_matrix" -> CorrelationOracleSql,
    "q_label_centroids" ->
      """SELECT label, i - 1 AS idx, round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS centroid_val
        |FROM embeddings CROSS JOIN generate_series(1, 64) t(i)
        |GROUP BY label, i""".stripMargin,
    "q_error_anomalies" ->
      """WITH h AS (
        |  SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_s,
        |         count(CASE WHEN event_type = 'error' THEN 1 END) AS n_errors,
        |         count(*) AS n_events
        |  FROM events GROUP BY 1
        |), r AS (
        |  SELECT *, CAST(n_errors AS DOUBLE) / n_events AS error_rate FROM h
        |), stats AS (
        |  SELECT avg(error_rate) AS mean_rate, stddev_samp(error_rate) AS sd_rate FROM r)
        |SELECT hour_s, n_errors, n_events, round(error_rate, 6) AS error_rate,
        |       error_rate > mean_rate + 2.0 * sd_rate AS is_anomaly
        |FROM r CROSS JOIN stats""".stripMargin,
    "q_hourly_profile" ->
      s"""SELECT event_type, CAST(hour(ts) AS INT) AS hour_of_day, count(*) AS n,
        |       ${Money.sumSql("value")} AS total_value
        |FROM events GROUP BY event_type, hour(ts)""".stripMargin,
    "q_jaccard_adjacent" ->
      s"""WITH d AS (
         |  SELECT doc_id, list_distinct($TokensSql) AS words FROM documents
         |), p AS (
         |  SELECT a.doc_id AS id1, b.doc_id AS id2, a.words AS w1, b.words AS w2
         |  FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
         |)
         |SELECT id1, id2,
         |       CASE WHEN len(list_distinct(list_concat(w1, w2))) = 0 THEN 0.0
         |            ELSE CAST(len(list_intersect(w1, w2)) AS DOUBLE)
         |                 / len(list_distinct(list_concat(w1, w2)))
         |       END AS jaccard
         |FROM p""".stripMargin,
    "q_lsh_tuning" -> LshTuningOracleSql,
    "q_neardup_verify" ->
      s"""WITH t AS (
         |  SELECT doc_id, $TokensSql AS toks FROM documents
         |), d AS (
         |  SELECT doc_id, list_distinct(
         |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
         |         ELSE list_transform(generate_series(1, len(toks) - 2),
         |                             i -> array_to_string(toks[i:i+2], ' '))
         |    END) AS sh
         |  FROM t)
         |SELECT a.doc_id AS id1, b.doc_id AS id2,
         |       CASE WHEN len(list_distinct(list_concat(a.sh, b.sh))) = 0 THEN 0.0
         |            ELSE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |                 / len(list_distinct(list_concat(a.sh, b.sh)))
         |       END AS jaccard
         |FROM d a JOIN d b ON b.doc_id BETWEEN a.doc_id + 1 AND a.doc_id + 5""".stripMargin,
    // prefix-filter similarity join: same df-ordered prefix + size-filter
    // + exact-verify spelling as SimilarityJoin (the q_copurchase
    // replicate-the-capped-spelling discipline; ≡ naive is spec-proven)
    "q_similarity_join" -> SimilarityJoinOracleSql,
    "q_dedup_method_overlap" ->
      s"""WITH pp AS (
         |  SELECT DISTINCT doc_id FROM (
         |    SELECT id1 AS doc_id FROM ($SimilarityJoinOracleSql)
         |    UNION ALL
         |    SELECT id2 AS doc_id FROM ($SimilarityJoinOracleSql))),
         |ssx AS (SELECT DISTINCT doc_id FROM ($SubstrSpansSql
         |  SELECT doc_id, span_start, span_end, n_windows FROM spans)),
         |m AS (
         |  SELECT pp.doc_id IS NOT NULL AS in_pp, ssx.doc_id IS NOT NULL AS in_ss
         |  FROM pp FULL OUTER JOIN ssx ON pp.doc_id = ssx.doc_id)
         |SELECT coalesce(CAST(sum(CASE WHEN in_pp THEN 1 ELSE 0 END) AS BIGINT), 0) AS n_neardup,
         |       coalesce(CAST(sum(CASE WHEN in_ss THEN 1 ELSE 0 END) AS BIGINT), 0) AS n_substr,
         |       coalesce(CAST(sum(CASE WHEN in_pp AND in_ss THEN 1 ELSE 0 END) AS BIGINT), 0) AS n_both,
         |       CAST(count(*) AS BIGINT) AS n_either,
         |       CASE WHEN count(*) = 0 THEN 0
         |            ELSE CAST(coalesce(sum(CASE WHEN in_pp AND in_ss THEN 1 ELSE 0 END), 0)
         |                      * 1000000 // count(*) AS BIGINT) END AS agreement_e6
         |FROM m""".stripMargin,
    // transitivity stated directly as a recursive CTE (reachability →
    // min per node); oracle-validated against a union-find ground truth.
    // Same shingle/posting/cap/≥5-shared construction as the Spark side.
    "q_dedup_components" ->
      s"""$DedupCompCte
         |SELECT doc_id, coalesce(comp.component, doc_id) AS component
         |FROM documents LEFT JOIN comp ON comp.node = doc_id""".stripMargin,
    "q_dup_cluster_sizes" ->
      s"""$DedupCompCte,
         |asg AS (SELECT coalesce(comp.component, doc_id) AS component
         |        FROM documents LEFT JOIN comp ON comp.node = doc_id),
         |cs AS (SELECT component, CAST(count(*) AS BIGINT) AS cluster_size
         |       FROM asg GROUP BY component)
         |SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
         |FROM cs GROUP BY cluster_size""".stripMargin,
    "q_readability" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |         CAST(len($TokensSql) AS BIGINT) AS n_words,
         |         greatest(1, CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT))
         |           AS n_sentences,
         |         CAST(coalesce(list_sum(list_transform($TokensSql,
         |           w -> greatest(1, len(regexp_extract_all(w, '[aeiouy]+'))))), 0) AS BIGINT)
         |           AS n_syllables
         |  FROM documents)
         |SELECT doc_id, n_words, n_sentences, n_syllables,
         |       CASE WHEN n_words = 0 THEN 0
         |            ELSE CAST(floor((0.39 * CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE)
         |                 + 11.8 * CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)
         |                 - 15.59) * 1000000.0 + 0.5) AS BIGINT) END AS fk_e6
         |FROM t""".stripMargin,
    // q_dedup_components' CTE chain, filtered to the canonical survivors
    "q_dedup_keep" ->
      s"""$DedupCompCte
         |SELECT doc_id, source, lang
         |FROM documents LEFT JOIN comp ON comp.node = doc_id
         |WHERE comp.component IS NULL OR comp.component = doc_id""".stripMargin,
    // same components, quality policy: longest doc per cluster survives
    "q_dedup_keep_best" ->
      s"""$DedupCompCte,
         |wc AS (
         |  SELECT doc_id, n_chars, coalesce(comp.component, doc_id) AS component
         |  FROM documents LEFT JOIN comp ON comp.node = doc_id),
         |r AS (
         |  SELECT doc_id, component, n_chars,
         |         row_number() OVER (PARTITION BY component
         |                            ORDER BY n_chars DESC, doc_id) AS rk
         |  FROM wc)
         |SELECT doc_id, component, n_chars FROM r WHERE rk = 1""".stripMargin,
    "q_lang_id" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang AS lang_declared, text, $TokensSql AS toks FROM documents
         |), s AS (
         |  SELECT doc_id, lang_declared, text,
         |         len(list_filter(toks, x -> list_contains(
         |           ['der','die','das','und','ist','nicht','ein','mit','für','von'], x))) AS de,
         |         len(list_filter(toks, x -> list_contains(
         |           ['the','and','is','of','to','in','that','it','for','with'], x))) AS en,
         |         len(list_filter(toks, x -> list_contains(
         |           ['el','la','los','las','de','que','y','es','en','un'], x))) AS es,
         |         len(list_filter(toks, x -> list_contains(
         |           ['le','la','les','des','et','est','que','une','dans','pour'], x))) AS fr
         |  FROM t)
         |SELECT doc_id, lang_declared,
         |       CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
         |            WHEN greatest(de, en, es, fr) = 0 THEN 'und'
         |            WHEN de >= en AND de >= es AND de >= fr THEN 'de'
         |            WHEN en >= es AND en >= fr THEN 'en'
         |            WHEN es >= fr THEN 'es'
         |            ELSE 'fr' END AS lang_detected
         |FROM s""".stripMargin,
    "q_embedding_norms" ->
      """SELECT vec_id,
        |       sqrt(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * x), 'sum'))
        |         AS l2_norm
        |FROM embeddings""".stripMargin,
    "q_knn_bruteforce" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id < 5),
        |c AS (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |         list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])) AS cos
        |  FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.query_id
        |), r AS (
        |  SELECT query_id, neighbor_id, cos,
        |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        |  FROM c)
        |SELECT query_id, neighbor_id, round(cos, 6) AS cos, rank FROM r WHERE rank <= 10""".stripMargin,
    // same scoring kernel as q_knn_bruteforce but over the deterministic
    // ±100-id candidate window — hash-matches the math the LSH/IVF variants
    // share (their bucketing is engine-specific, recall-spec'd instead)
    "q_knn_subset" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id < 5),
        |c AS (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |         list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])) AS cos
        |  FROM q JOIN embeddings e
        |    ON e.vec_id <> q.query_id
        |   AND e.vec_id BETWEEN q.query_id - 100 AND q.query_id + 100
        |), r AS (
        |  SELECT query_id, neighbor_id, cos,
        |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        |  FROM c)
        |SELECT query_id, neighbor_id, round(cos, 6) AS cos, rank FROM r WHERE rank <= 10""".stripMargin,
    // the q_knn_bruteforce ranking kernel run at three prefix widths via
    // list_slice — recall is a pure set intersection of the two rankings
    "q_matryoshka_recall" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
        |fr AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT q.query_id, e.vec_id AS neighbor_id,
        |           row_number() OVER (PARTITION BY q.query_id
        |             ORDER BY list_cosine_similarity(q.qv, e.v) DESC, e.vec_id) AS rank
        |    FROM q CROSS JOIN e WHERE e.vec_id <> q.query_id)
        |  WHERE rank <= 10),
        |dims AS (SELECT unnest([8, 16, 32]) AS dim),
        |pref AS (
        |  SELECT dim, query_id, neighbor_id FROM (
        |    SELECT d.dim, q.query_id, e.vec_id AS neighbor_id,
        |           row_number() OVER (PARTITION BY d.dim, q.query_id
        |             ORDER BY list_cosine_similarity(list_slice(q.qv, 1, d.dim),
        |                                             list_slice(e.v, 1, d.dim)) DESC,
        |                      e.vec_id) AS rank
        |    FROM dims d CROSS JOIN q CROSS JOIN e WHERE e.vec_id <> q.query_id)
        |  WHERE rank <= 10)
        |SELECT p.dim, p.query_id,
        |       CAST(count(f.neighbor_id) AS BIGINT) AS n_hits,
        |       round(CAST(count(f.neighbor_id) AS DOUBLE) / 10, 6) AS recall
        |FROM pref p LEFT JOIN fr f
        |  ON p.query_id = f.query_id AND p.neighbor_id = f.neighbor_id
        |GROUP BY p.dim, p.query_id""".stripMargin,
    // same scale/code arithmetic as Quantize.int8Codes, term for term
    "q_quantize_int8" ->
      """WITH s AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |         list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x)))
        |           / 127.0 AS sc
        |  FROM embeddings)
        |SELECT vec_id, round(sc, 6) AS q_scale,
        |       array_to_string(list_transform(v, x -> CASE WHEN sc = 0 THEN 0
        |         ELSE GREATEST(-127, LEAST(127, CAST(floor(x / sc + 0.5) AS INT))) END), ' ')
        |         AS code_seq
        |FROM s""".stripMargin,
    // quantized cosine spelled dot/(sqrt(na)*sqrt(nb)) with integer sums —
    // the exact formula windowedKnn computes, so even near-ties order
    // identically
    "q_knn_int8_subset" ->
      """WITH s AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |         list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x)))
        |           / 127.0 AS sc
        |  FROM embeddings),
        |e AS (
        |  SELECT vec_id,
        |         list_transform(v, x -> CASE WHEN sc = 0 THEN 0.0
        |           ELSE CAST(GREATEST(-127, LEAST(127, CAST(floor(x / sc + 0.5) AS INT)))
        |                AS DOUBLE) END) AS q
        |  FROM s),
        |qs AS (SELECT vec_id AS query_id, q AS qv FROM e WHERE vec_id < 5),
        |c AS (
        |  SELECT qs.query_id, e.vec_id AS neighbor_id,
        |         list_inner_product(qs.qv, e.q)
        |           / (sqrt(list_inner_product(qs.qv, qs.qv))
        |              * sqrt(list_inner_product(e.q, e.q))) AS cos
        |  FROM qs JOIN e
        |    ON e.vec_id <> qs.query_id
        |   AND e.vec_id BETWEEN qs.query_id - 100 AND qs.query_id + 100
        |), r AS (
        |  SELECT query_id, neighbor_id, cos,
        |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        |  FROM c)
        |SELECT query_id, neighbor_id, round(cos, 6) AS cos, rank FROM r WHERE rank <= 10""".stripMargin,
    "q_exact_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users
        |FROM events GROUP BY event_type""".stripMargin,
    // the sketch-once/union-up estimate is engine-specific; the oracled
    // fact is the exact counts plus the ±5% contract boolean
    "q_hll_rollup_checked" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
        |       TRUE AS rollup_within_5pct
        |FROM events GROUP BY event_type""".stripMargin,
    // the sketch's rank-error guarantee stated as a fact the exact engine
    // agrees with — a drifting quantile estimate flips rank_ok
    "q_approx_quantiles_checked" ->
      """SELECT event_type, CAST(q.q_micros AS BIGINT) AS q_micros,
        |       count(*) AS n, TRUE AS rank_ok
        |FROM events CROSS JOIN (VALUES (500000), (900000)) q(q_micros)
        |GROUP BY event_type, q.q_micros""".stripMargin,
    "q_bpe_roundtrip" ->
      s"""WITH toks AS (SELECT unnest($TokensSql) AS w FROM documents)
         |SELECT count(DISTINCT w) AS n_words,
         |       count(DISTINCT w) AS n_roundtrip
         |FROM toks""".stripMargin,
    // PQ deterministic-codebook twins. The codebook is the 8 lowest-id
    // vectors' subspace slices (m=4 × 16 dims); per-subspace squared L2 is
    // a list_sum left fold — bit-identical to Spark's aggregate fold — so
    // argmin ties resolve to the same lowest code in both engines.
    "q_pq_codes" ->
      s"""$PqEncodeSql
         |SELECT vec_id, string_agg(CAST(code AS VARCHAR), ' ' ORDER BY s) AS code_seq
         |FROM enc GROUP BY vec_id""".stripMargin,
    // ADC: a candidate's score is the s-ordered fold of the QUERY's exact
    // subspace distances to the candidate's assigned centroids — list(sq
    // ORDER BY s) reproduces Spark's subspace fold order exactly, so
    // equal-code candidates tie bit-identically and neighbor_id decides
    "q_pq_subset" ->
      s"""$PqEncodeSql,
         |score AS (
         |  SELECT qd.vec_id AS query_id, enc.vec_id AS neighbor_id,
         |         list_sum(list(qd.sq ORDER BY qd.s)) AS adist
         |  FROM enc JOIN dist qd ON qd.s = enc.s AND qd.code = enc.code
         |  WHERE qd.vec_id < 5 AND enc.vec_id <> qd.vec_id
         |  GROUP BY 1, 2),
         |r AS (
         |  SELECT query_id, neighbor_id, adist,
         |         row_number() OVER (PARTITION BY query_id ORDER BY adist, neighbor_id) AS rank
         |  FROM score)
         |SELECT query_id, neighbor_id, round(adist, 6) AS adist, rank
         |FROM r WHERE rank <= 10""".stripMargin,
    // per-lang NTILE over (rounded score, doc_id) — the rounded score is
    // the hash-matched q_lm_score value, so the ordering (and therefore
    // every bucket) is bit-identical cross-engine
    "q_quality_buckets" ->
      s"""WITH t AS (SELECT doc_id, $TokensSql AS toks FROM documents),
         |pos AS (
         |  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
         |                 i -> toks[i] || ' ' || toks[i + 1])) AS b
         |  FROM t),
         |uni AS (SELECT w, count(*) AS cu
         |        FROM (SELECT unnest(toks) AS w FROM t) GROUP BY w),
         |bi AS (SELECT b, count(*) AS cb FROM pos GROUP BY b),
         |v AS (SELECT count(DISTINCT w) AS v
         |      FROM (SELECT unnest(toks) AS w FROM t)),
         |sc AS (
         |  SELECT pos.doc_id,
         |         round(avg(ln((bi.cb + 1.0) / (uni.cu + 1.0 * v.v))), 6) AS avg_logp
         |  FROM pos JOIN bi USING (b)
         |           JOIN uni ON uni.w = split_part(pos.b, ' ', 1)
         |           CROSS JOIN v
         |  GROUP BY pos.doc_id)
         |SELECT sc.doc_id, d.lang, sc.avg_logp,
         |       CAST(ntile(3) OVER (PARTITION BY d.lang
         |                           ORDER BY sc.avg_logp, sc.doc_id) AS INT) AS bucket
         |FROM sc JOIN documents d USING (doc_id)""".stripMargin,
    // the salted join is row-identical to the plain inner join by
    // construction — the oracle states the plain join
    "q_salted_join" ->
      s"""SELECT o_orderpriority, count(*) AS n_items,
         |       ${Money.sumSql("l_extendedprice * (1 - l_discount)")} AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderpriority""".stripMargin,
    // exact-substring twins: md5 window hashing, distinct-doc dup test and
    // gaps-and-islands span merge are all integer/string arithmetic —
    // bit-exact cross-engine by construction
    "q_substring_spans" ->
      s"""$SubstrSpansSql
         |SELECT doc_id, span_start, span_end, n_windows FROM spans""".stripMargin,
    "q_substring_clean" ->
      s"""$SubstrSpansSql,
         |pos AS (SELECT doc_id, toks, unnest(generate_series(0, len(toks)-1)) AS i FROM t),
         |kept AS (
         |  SELECT p.doc_id, p.i, p.toks[p.i+1] AS tok
         |  FROM pos p LEFT JOIN spans s
         |    ON s.doc_id = p.doc_id AND p.i BETWEEN s.span_start AND s.span_end
         |  WHERE s.doc_id IS NULL),
         |ck AS (SELECT doc_id, count(*) AS n_kept,
         |              md5(string_agg(tok, ' ' ORDER BY i)) AS clean_md5
         |       FROM kept GROUP BY doc_id)
         |SELECT t.doc_id, len(t.toks) AS n_tokens,
         |       len(t.toks) - coalesce(ck.n_kept, 0) AS n_removed,
         |       coalesce(ck.clean_md5, md5('')) AS clean_md5
         |FROM t LEFT JOIN ck USING (doc_id)""".stripMargin,
    // generated full replay of the 3-round integer-micros Lloyd iteration
    "q_kmeans_clusters" -> KMeansOracleSql,
    "q_sgd_det" -> SgdDetOracleSql,
    "q_line_stats" -> s"$PlantedLinesCte SELECT h, n_docs FROM freq",
    "q_url_canon" -> s"$SyntheticUrlsCte SELECT c_custkey, url, canon FROM t",
    "q_knn_ivfpq" -> IvfPqOracleSql,
    "q_url_hosts" ->
      s"""$SyntheticUrlsCte
         |SELECT lower(split_part(split_part(split_part(canon, '#', 1), '://', 2), '/', 1)) AS host,
         |       CAST(count(*) AS BIGINT) AS n_urls,
         |       CAST(count(DISTINCT canon) AS BIGINT) AS n_canonical
         |FROM t GROUP BY 1""".stripMargin,
    "q_line_dedup" ->
      s"""$PlantedLinesCte
         |SELECT n.doc_id,
         |       CAST(count(*) AS BIGINT) AS n_lines,
         |       CAST(count(f.h) AS BIGINT) AS n_dropped,
         |       md5(coalesce(string_agg(CASE WHEN f.h IS NULL THEN n.line END,
         |                               chr(10) ORDER BY n.idx), '')) AS clean_md5
         |FROM norm n LEFT JOIN freq f ON n.h = f.h
         |GROUP BY n.doc_id""".stripMargin,
    "q_knn_ivf_det" -> IvfDetOracleSql,
    "q_ivf_recall" -> IvfRecallOracleSql,
    "q_rbo_ivf" -> RboIvfOracleSql,
    "q_wordpiece_vocab" -> WordPieceOracle.vocabSql,
    "q_wordpiece_encode" -> WordPieceOracle.encodeSql,
    "q_wordpiece_fertility" -> WordPieceOracle.fertilitySql,
    "q_wordpiece_roundtrip" -> WordPieceOracle.roundtripSql,
    "q_unigram_lm" -> UnigramLmOracleSql,
    "q_unigram_subwords" -> UnigramSubwordsOracleSql,
    "q_unigram_fertility" -> UnigramFertilityOracleSql,
    "q_unigram_roundtrip" -> UnigramRoundtripOracleSql,
    "q_token_meter" -> TokenMeterOracleSql,
    // generated replay of the 10-merge BPE trainer + its induced subword
    // vocabulary (rows-only since r6; the double-space replace encoding
    // finally gives the greedy merge kernel an exact SQL spelling)
    "q_bpe_merges" -> BpeOracle.mergesSql,
    "q_bpe_subwords" -> BpeOracle.subwordsSql,
    "q_bpe_fertility" -> BpeOracle.fertilitySql,
    "q_bytebpe_merges" -> ByteBpeOracle.mergesSql,
    "q_bytebpe_encode" -> ByteBpeOracle.encodeSql,
    "q_tokenizer_compare" ->
      s"""SELECT 'bpe' AS family, * FROM (${BpeOracle.fertilitySql})
         |UNION ALL
         |SELECT 'bytebpe' AS family, * FROM (${ByteBpeOracle.fertilitySql})
         |UNION ALL
         |SELECT 'unigram' AS family, * FROM ($UnigramFertilityOracleSql)
         |UNION ALL
         |SELECT 'wordpiece' AS family, * FROM (${WordPieceOracle.fertilitySql})""".stripMargin,
    "q_tokenizer_population" ->
      s"""WITH tok AS (SELECT unnest($TokensSql) AS word FROM documents),
         |wc AS (SELECT word, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY word),
         |ag AS (
         |  SELECT CAST(sum(n) AS BIGINT) AS n_occurrences,
         |         CAST(count(*) AS BIGINT) AS n_distinct_words,
         |         CAST(sum(CASE WHEN regexp_matches(word, '^[\\x21-\\x7e]{1,12}$$')
         |                       THEN n ELSE 0 END) AS BIGINT) AS n_unigram_pop,
         |         CAST(sum(CASE WHEN regexp_matches(word, '^[\\x21-\\x22\\x24-\\x7e]{1,12}$$')
         |                       THEN n ELSE 0 END) AS BIGINT) AS n_wordpiece_pop
         |  FROM wc)
         |SELECT n_occurrences, n_distinct_words, n_unigram_pop, n_wordpiece_pop,
         |       n_unigram_pop * 1000000 // n_occurrences AS unigram_cov_e6,
         |       n_wordpiece_pop * 1000000 // n_occurrences AS wordpiece_cov_e6
         |FROM ag""".stripMargin,
    "q_kcenter_coreset" -> KCenterOracleSql,
    "q_mmr_selection" -> MmrOracleSql,
    "q_context_pack" -> ContextPackOracleSql,
    // ARI + purity of the replayed k-means vs labels: contingency from
    // the shared KMeansCtes assignment a3; pair counts x(x−1)//2 exact
    // (even product, non-negative so // ≡ DIV); one fixed-spelling
    // rational over integers < 2^53 → floor-6; degenerate denominator→1
    "q_cluster_ari" ->
      s"""$KMeansCtes,
         |cont AS (
         |  SELECT a.cid AS c, e.label AS l, count(*) AS nij
         |  FROM a3 a JOIN embeddings e ON e.vec_id = a.vec_id
         |  GROUP BY 1, 2),
         |idx AS (
         |  SELECT CAST(sum(nij * (nij - 1) // 2) AS BIGINT) AS pair_index,
         |         CAST(sum(nij) AS BIGINT) AS n
         |  FROM cont),
         |ap AS (
         |  SELECT CAST(sum(a_ * (a_ - 1) // 2) AS BIGINT) AS a_pairs
         |  FROM (SELECT CAST(sum(nij) AS BIGINT) AS a_ FROM cont GROUP BY c)),
         |bp AS (
         |  SELECT CAST(sum(b_ * (b_ - 1) // 2) AS BIGINT) AS b_pairs
         |  FROM (SELECT CAST(sum(nij) AS BIGINT) AS b_ FROM cont GROUP BY l)),
         |pu AS (
         |  SELECT CAST(sum(m_) AS BIGINT) AS purity_hits
         |  FROM (SELECT max(nij) AS m_ FROM cont GROUP BY c))
         |SELECT n, pair_index, a_pairs, b_pairs, purity_hits,
         |  CAST(CASE WHEN (CAST(a_pairs + b_pairs AS DOUBLE) / 2.0
         |                  - CAST(a_pairs AS DOUBLE) * CAST(b_pairs AS DOUBLE)
         |                    / CAST(n * (n - 1) // 2 AS DOUBLE)) = 0.0
         |       THEN 1.0
         |       ELSE floor((CAST(pair_index AS DOUBLE)
         |                   - CAST(a_pairs AS DOUBLE) * CAST(b_pairs AS DOUBLE)
         |                     / CAST(n * (n - 1) // 2 AS DOUBLE))
         |                  / (CAST(a_pairs + b_pairs AS DOUBLE) / 2.0
         |                     - CAST(a_pairs AS DOUBLE) * CAST(b_pairs AS DOUBLE)
         |                       / CAST(n * (n - 1) // 2 AS DOUBLE))
         |                  * 1000000.0 + 0.5) / 1000000.0 END AS DOUBLE) AS ari,
         |  floor(CAST(purity_hits AS DOUBLE) / CAST(n AS DOUBLE)
         |        * 1000000.0 + 0.5) / 1000000.0 AS purity
         |FROM idx CROSS JOIN ap CROSS JOIN bp CROSS JOIN pu""".stripMargin,
    // NMI over the same contingency table: each (nij/n)·ln(nij·n/(ai·bj))
    // and marginal-entropy term is floor(x·1e6 + 0.5) BEFORE the BIGINT
    // sum (order-free; 1e6 is the proven ln-term granularity), final
    // 2·MI/(HU+HV) one replayed division, floor-6; HU+HV=0 → 1
    "q_cluster_nmi" ->
      s"""$KMeansCtes,
         |cont AS (
         |  SELECT a.cid AS c, e.label AS l, count(*) AS nij
         |  FROM a3 a JOIN embeddings e ON e.vec_id = a.vec_id
         |  GROUP BY 1, 2),
         |nt AS (SELECT CAST(sum(nij) AS BIGINT) AS n FROM cont),
         |am AS (SELECT c, CAST(sum(nij) AS BIGINT) AS a_ FROM cont GROUP BY c),
         |bm AS (SELECT l, CAST(sum(nij) AS BIGINT) AS b_ FROM cont GROUP BY l),
         |mi AS (
         |  SELECT CAST(sum(CAST(floor(
         |      (CAST(cont.nij AS DOUBLE) / CAST(nt.n AS DOUBLE))
         |      * ln((CAST(cont.nij AS DOUBLE) * CAST(nt.n AS DOUBLE))
         |           / (CAST(am.a_ AS DOUBLE) * CAST(bm.b_ AS DOUBLE)))
         |      * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS mi_e6,
         |    max(nt.n) AS n
         |  FROM cont JOIN am USING (c) JOIN bm USING (l) CROSS JOIN nt),
         |hu AS (
         |  SELECT CAST(sum(CAST(floor(
         |      -(CAST(a_ AS DOUBLE) / CAST(nt.n AS DOUBLE))
         |      * ln(CAST(a_ AS DOUBLE) / CAST(nt.n AS DOUBLE))
         |      * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS hu_e6
         |  FROM am CROSS JOIN nt),
         |hv AS (
         |  SELECT CAST(sum(CAST(floor(
         |      -(CAST(b_ AS DOUBLE) / CAST(nt.n AS DOUBLE))
         |      * ln(CAST(b_ AS DOUBLE) / CAST(nt.n AS DOUBLE))
         |      * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS hv_e6
         |  FROM bm CROSS JOIN nt)
         |SELECT n, mi_e6, hu_e6, hv_e6,
         |  CAST(CASE WHEN hu_e6 + hv_e6 = 0 THEN 1.0
         |       ELSE floor((2.0 * CAST(mi_e6 AS DOUBLE))
         |                  / CAST(hu_e6 + hv_e6 AS DOUBLE)
         |                  * 1000000.0 + 0.5) / 1000000.0 END AS DOUBLE) AS nmi
         |FROM mi CROSS JOIN hu CROSS JOIN hv""".stripMargin,
    // generated full replay of the 2-round pseudo-exp EM (soft clustering)
    "q_gmm_soft" -> GmmOracleSql,
    // Gini rank formula over exact integer micros; single replayed double
    // expression, floor-6 output (arithmetic-derived float)
    "q_spend_gini" ->
      """WITH sp AS (
        |  SELECT user_id, sum(CAST(round((value) * 1e6) AS BIGINT)) AS m
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id
        |), rk AS (
        |  SELECT m, row_number() OVER (ORDER BY m, user_id) AS i FROM sp
        |), ag AS (
        |  SELECT count(*) AS n_users, CAST(sum(m) AS BIGINT) AS tot,
        |         CAST(sum(i * m) AS BIGINT) AS sw
        |  FROM rk
        |)
        |SELECT n_users,
        |       CAST(floor((tot + 5000) / 10000.0) AS BIGINT) / 100.0 AS total_money,
        |       floor((2.0 * CAST(sw AS DOUBLE)
        |                / (CAST(n_users AS DOUBLE) * CAST(tot AS DOUBLE))
        |              - CAST(n_users + 1 AS DOUBLE) / CAST(n_users AS DOUBLE))
        |             * 1000000.0 + 0.5) / 1000000.0 AS gini
        |FROM ag""".stripMargin,
    // integer prefix sums; the split statistic is identical IEEE on both
    // engines so the float argmax (gap DESC, t) agrees bit-for-bit
    "q_changepoint" ->
      """WITH hrs AS (
        |  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h, count(*) AS c
        |  FROM events GROUP BY 1
        |), ser AS (
        |  SELECT h, row_number() OVER (ORDER BY h) AS t,
        |         CAST(sum(c) OVER (ORDER BY h ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ps,
        |         CAST(sum(c) OVER () AS BIGINT) AS tot,
        |         count(*) OVER () AS tt
        |  FROM hrs
        |), sp AS (
        |  SELECT h, t, CAST(ps AS DOUBLE) / CAST(t AS DOUBLE) AS mb,
        |         CAST(tot - ps AS DOUBLE) / CAST(tt - t AS DOUBLE) AS ma
        |  FROM ser WHERE t < tt
        |), g AS (SELECT h, t, mb, ma, abs(mb - ma) AS gap FROM sp)
        |SELECT h AS split_hour, t AS t_split,
        |       floor(mb * 1000000.0 + 0.5) / 1000000.0 AS mean_before,
        |       floor(ma * 1000000.0 + 0.5) / 1000000.0 AS mean_after,
        |       floor(gap * 1000000.0 + 0.5) / 1000000.0 AS gap
        |FROM g
        |QUALIFY row_number() OVER (ORDER BY gap DESC, t) = 1""".stripMargin,
    // generated per-lag replay from exact integer sufficient statistics
    "q_acf_hourly" -> AcfOracleSql,
    // deterministic ntile under a total order; Money integer-micros twin
    "q_rfm_segments" ->
      """WITH pu AS (
        |  SELECT user_id, max(CAST(floor(epoch(ts)) AS BIGINT)) AS rec_s,
        |         count(*) AS freq,
        |         sum(CAST(round((value) * 1e6) AS BIGINT)) AS mon
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id
        |), seg AS (
        |  SELECT user_id, mon,
        |         CAST(ntile(4) OVER (ORDER BY rec_s, user_id) AS BIGINT) * 100
        |       + CAST(ntile(4) OVER (ORDER BY freq, user_id) AS BIGINT) * 10
        |       + CAST(ntile(4) OVER (ORDER BY mon, user_id) AS BIGINT) AS segment
        |  FROM pu
        |)
        |SELECT segment, count(*) AS n_users,
        |       CAST(floor((CAST(sum(mon) AS BIGINT) + 5000) / 10000.0) AS BIGINT) / 100.0
        |         AS total_money
        |FROM seg GROUP BY segment""".stripMargin,
    // exact micros time axis (epoch_ns//1000 ≡ ts_ns DIV 1000); integer
    // floor-division credit — non-negative operands, so // ≡ Spark DIV
    "q_linear_attribution" ->
      """WITH p AS (
        |  SELECT user_id, event_id AS purchase_id, epoch_ns(ts) // 1000 AS p_us,
        |         CAST(round((value) * 1e6) AS BIGINT) AS value_micros
        |  FROM events WHERE event_type = 'purchase' AND value >= 0
        |), v AS (
        |  SELECT user_id, epoch_ns(ts) // 1000 AS v_us
        |  FROM events WHERE event_type = 'view'
        |), j AS (
        |  SELECT p.purchase_id, p.value_micros, v.v_us
        |  FROM p JOIN v USING (user_id)
        |  WHERE v.v_us < p.p_us AND v.v_us >= p.p_us - 86400000000
        |), c AS (
        |  SELECT v_us,
        |         value_micros // (count(*) OVER (PARTITION BY purchase_id)) AS credit_micros
        |  FROM j
        |)
        |SELECT (v_us // 3600000000) % 24 AS hour_of_day,
        |       count(*) AS n_credited_views,
        |       CAST(floor((CAST(sum(credit_micros) AS BIGINT) + 5000) / 10000.0) AS BIGINT)
        |         / 100.0 AS attributed_money
        |FROM c GROUP BY 1""".stripMargin,
    // md5-48 arms (the shared HashSplit spelling); lift and z are single
    // replayed double expressions over exact integer counts
    "q_ab_lift" ->
      """WITH u AS (
        |  SELECT user_id,
        |         CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 10
        |              THEN 1 ELSE 0 END AS conv
        |  FROM events GROUP BY user_id
        |), a AS (
        |  SELECT ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT % 2
        |           AS arm, conv
        |  FROM u
        |), ag AS (
        |  SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |         CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS conv_a,
        |         CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS conv_b
        |  FROM a
        |)
        |SELECT n_a, n_b, conv_a, conv_b,
        |       floor((CASE WHEN n_a = 0 OR n_b = 0 THEN 0.0
        |              ELSE CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)
        |                   - CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) END)
        |             * 1000000.0 + 0.5) / 1000000.0 AS lift,
        |       floor((CASE WHEN n_a = 0 OR n_b = 0 OR conv_a + conv_b = 0
        |                     OR conv_a + conv_b = n_a + n_b THEN 0.0
        |              ELSE (CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)
        |                    - CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE))
        |                   / sqrt((CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
        |                          * (1.0 - CAST(conv_a + conv_b AS DOUBLE)
        |                                   / CAST(n_a + n_b AS DOUBLE))
        |                          * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
        |              END)
        |             * 1000000.0 + 0.5) / 1000000.0 AS z
        |FROM ag""".stripMargin,
    "q_msprt_lift" -> MsprtOracleSql,
    // HHI = Σc²/T² is ONE division of exact integers — the decile floor
    // lands identically even exactly on a bucket boundary
    "q_hhi_buckets" ->
      """WITH ct AS (
        |  SELECT user_id, event_type, count(*) AS c FROM events GROUP BY 1, 2
        |), per AS (
        |  SELECT user_id, CAST(sum(c * c) AS BIGINT) AS ss,
        |         CAST(sum(c) AS BIGINT) AS t
        |  FROM ct GROUP BY user_id
        |), h AS (
        |  SELECT CAST(ss AS DOUBLE) / CAST(t * t AS DOUBLE) AS hhi, t FROM per
        |)
        |SELECT CAST(floor(hhi * 10.0) AS BIGINT) AS bucket, count(*) AS n_users,
        |       CAST(sum(t) AS BIGINT) AS n_events
        |FROM h GROUP BY 1""".stripMargin,
    // adjacent-bigram PMI against raw corpus unigram marginals; ln replay
    "q_pmi_bigrams" ->
      s"""WITH t AS (
         |  SELECT doc_id, $TokensSql AS toks FROM documents
         |), bi AS (
         |  SELECT unnest(list_transform(generate_series(2, len(toks)),
         |                               i -> struct_pack(w1 := toks[i-1], w2 := toks[i])))
         |           AS b
         |  FROM t WHERE len(toks) >= 2
         |), bc AS (
         |  SELECT b.w1 AS w1, b.w2 AS w2, count(*) AS n_pair
         |  FROM bi GROUP BY 1, 2 HAVING count(*) >= 5
         |), uni AS (
         |  SELECT w, count(*) AS cu
         |  FROM (SELECT unnest(toks) AS w FROM t) GROUP BY w
         |), nb AS (
         |  SELECT CAST(sum(len(toks) - 1) AS BIGINT) AS n_bi
         |  FROM t WHERE len(toks) >= 2
         |)
         |SELECT bc.w1, bc.w2, bc.n_pair,
         |       floor(ln(CAST(bc.n_pair AS DOUBLE) * CAST(nb.n_bi AS DOUBLE)
         |                / (CAST(u1.cu AS DOUBLE) * CAST(u2.cu AS DOUBLE)))
         |             * 1000000.0 + 0.5) / 1000000.0 AS pmi
         |FROM bc JOIN uni u1 ON bc.w1 = u1.w JOIN uni u2 ON bc.w2 = u2.w, nb""".stripMargin,
    // micros ordering + event_id tie-break (the q_markov discipline)
    "q_event_trigrams" ->
      """WITH e AS (
        |  SELECT user_id, event_type AS e1, epoch_ns(ts) // 1000 AS ts_us, event_id
        |  FROM events
        |), lg AS (
        |  SELECT user_id, e1,
        |         lead(e1, 1) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS e2,
        |         lead(e1, 2) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS e3
        |  FROM e
        |)
        |SELECT e1, e2, e3, count(*) AS n
        |FROM lg WHERE e2 IS NOT NULL AND e3 IS NOT NULL
        |GROUP BY 1, 2, 3 HAVING count(*) >= 10""".stripMargin,
    // EWMA integer recurrence replayed as a recursive CTE: each step is
    // one iteration (~20 ms each in DuckDB — why the oracled contract is
    // the 30-step DAILY series); the per-type list rides INSIDE the
    // recursion so no other CTE is re-evaluated per step; the floor
    // division is spelled on doubles (Spark DIV truncates toward zero,
    // DuckDB // floors — Δ is negative on every decay)
    "q_ewma_daily" ->
      """WITH RECURSIVE hc AS MATERIALIZED (
        |  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS h,
        |         count(*) AS c
        |  FROM events GROUP BY 1, 2
        |), span AS MATERIALIZED (
        |  SELECT min(h) AS h0, max(h) AS h1 FROM hc
        |), dense AS MATERIALIZED (
        |  SELECT t.event_type, g.h, coalesce(hc.c, 0) AS x
        |  FROM (SELECT DISTINCT event_type FROM hc) t
        |  CROSS JOIN (SELECT unnest(range(h0, h1 + 1)) AS h FROM span) g
        |  LEFT JOIN hc ON hc.event_type = t.event_type AND hc.h = g.h
        |), lists AS MATERIALIZED (
        |  SELECT event_type, list({'h': h, 'x': x} ORDER BY h) AS lst
        |  FROM dense GROUP BY event_type
        |), r AS (
        |  SELECT event_type, lst, 1 AS idx,
        |         CAST(lst[1].x * 1000000 AS BIGINT) AS s
        |  FROM lists
        |  UNION ALL
        |  SELECT event_type, lst, idx + 1,
        |         s + CAST(floor((lst[idx + 1].x * 1000000 - s) / 8.0) AS BIGINT)
        |  FROM r WHERE idx < len(lst)
        |)
        |SELECT event_type, lst[idx].h * 86400 AS bucket_s,
        |       CAST(lst[idx].x AS BIGINT) AS n_events,
        |       s AS ewma_micros, CAST(s AS DOUBLE) / 1000000.0 AS ewma
        |FROM r""".stripMargin,
    // dense type × hour grid; population variance from exact integers
    "q_fano_factor" ->
      """WITH hc AS (
        |  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h,
        |         count(*) AS c
        |  FROM events GROUP BY 1, 2
        |), bnd AS (
        |  SELECT min(CAST(floor(epoch(ts)) AS BIGINT) // 3600) AS h0,
        |         max(CAST(floor(epoch(ts)) AS BIGINT) // 3600) AS h1
        |  FROM events
        |), grid AS (
        |  SELECT t.event_type, g.h
        |  FROM (SELECT DISTINCT event_type FROM events) t,
        |       (SELECT unnest(range((SELECT h0 FROM bnd), (SELECT h1 FROM bnd) + 1)) AS h) g
        |), dense AS (
        |  SELECT grid.event_type, COALESCE(hc.c, 0) AS x
        |  FROM grid LEFT JOIN hc ON grid.event_type = hc.event_type AND grid.h = hc.h
        |), ag AS (
        |  SELECT event_type, count(*) AS n_hours, CAST(sum(x) AS BIGINT) AS s,
        |         CAST(sum(x * x) AS BIGINT) AS q
        |  FROM dense GROUP BY event_type
        |)
        |SELECT event_type, n_hours,
        |       floor((CAST(s AS DOUBLE) / CAST(n_hours AS DOUBLE))
        |             * 1000000.0 + 0.5) / 1000000.0 AS mean_per_hour,
        |       floor(((CAST(q AS DOUBLE) / CAST(n_hours AS DOUBLE)
        |               - (CAST(s AS DOUBLE) / CAST(n_hours AS DOUBLE))
        |                 * (CAST(s AS DOUBLE) / CAST(n_hours AS DOUBLE)))
        |              / (CAST(s AS DOUBLE) / CAST(n_hours AS DOUBLE)))
        |             * 1000000.0 + 0.5) / 1000000.0 AS fano
        |FROM ag""".stripMargin,
    // distinct-user incidence; lift is one replayed double expression
    "q_event_type_lift" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        |tot AS (SELECT event_type, count(*) AS n_t FROM ut GROUP BY 1),
        |nu AS (SELECT count(DISTINCT user_id) AS n_users FROM ut),
        |pr AS (
        |  SELECT x.event_type AS type_a, y.event_type AS type_b, count(*) AS n_both
        |  FROM ut x JOIN ut y ON x.user_id = y.user_id
        |                     AND x.event_type < y.event_type
        |  GROUP BY 1, 2
        |)
        |SELECT pr.type_a, pr.type_b, ta.n_t AS n_a, tb.n_t AS n_b, pr.n_both,
        |       floor((CAST(pr.n_both AS DOUBLE) * CAST(nu.n_users AS DOUBLE)
        |              / (CAST(ta.n_t AS DOUBLE) * CAST(tb.n_t AS DOUBLE)))
        |             * 1000000.0 + 0.5) / 1000000.0 AS lift
        |FROM pr JOIN tot ta ON pr.type_a = ta.event_type
        |        JOIN tot tb ON pr.type_b = tb.event_type, nu""".stripMargin,
    // doubled average ranks (rank + rank + cnt − 1) keep rank sums exact;
    // epoch-day weekday arithmetic, no engine dow numbering
    "q_rank_sum_test" ->
      """WITH p AS (
        |  SELECT CAST(round((value) * 1e6) AS BIGINT) AS v,
        |         ((CAST(floor(epoch(ts)) AS BIGINT) // 86400 + 3) % 7) >= 5 AS is_weekend
        |  FROM events WHERE event_type = 'purchase'
        |), r AS (
        |  SELECT v, is_weekend,
        |         CAST(rank() OVER (ORDER BY v) AS BIGINT) AS rk,
        |         count(*) OVER (PARTITION BY v) AS cnt
        |  FROM p
        |), r2t AS (SELECT is_weekend, rk * 2 + cnt - 1 AS r2 FROM r),
        |ag AS (
        |  SELECT CAST(sum(CASE WHEN is_weekend THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |         CAST(sum(CASE WHEN NOT is_weekend THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |         CAST(sum(CASE WHEN is_weekend THEN r2 ELSE 0 END) AS BIGINT) AS r2_a
        |  FROM r2t
        |), tc AS (
        |  SELECT CAST(sum(t * t * t - t) AS BIGINT) AS tcorr
        |  FROM (SELECT count(*) AS t FROM p GROUP BY v)
        |)
        |SELECT n_a, n_b, r2_a - n_a * (n_a + 1) AS u2_a,
        |       floor(((CAST(r2_a - n_a * (n_a + 1) AS DOUBLE)
        |               - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
        |              / (2.0 * sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0
        |                            * ((CAST(n_a + n_b AS DOUBLE) + 1.0)
        |                               - CAST(tcorr AS DOUBLE)
        |                                 / (CAST(n_a + n_b AS DOUBLE)
        |                                    * (CAST(n_a + n_b AS DOUBLE) - 1.0))))))
        |             * 1000000.0 + 0.5) / 1000000.0 AS z
        |FROM ag, tc""".stripMargin,
    // one user exchange for both lag and lead; integer day arithmetic
    "q_daily_churn" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d
        |  FROM events
        |), f AS (
        |  SELECT user_id, d,
        |         lag(d, 1) OVER (PARTITION BY user_id ORDER BY d) AS prev,
        |         lead(d, 1) OVER (PARTITION BY user_id ORDER BY d) AS next
        |  FROM ud
        |)
        |SELECT d, count(*) AS n_active,
        |       CAST(sum(CASE WHEN prev IS NULL OR prev < d - 1 THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_new,
        |       CAST(sum(CASE WHEN next = d + 1 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_retained,
        |       CAST(sum(CASE WHEN next IS NULL OR next > d + 1 THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_churned
        |FROM f GROUP BY d""".stripMargin,
    // textbook gaps-and-islands: island id = day - row_number
    "q_user_streaks" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d
        |  FROM events
        |), i AS (
        |  SELECT user_id,
        |         d - row_number() OVER (PARTITION BY user_id ORDER BY d) AS isl
        |  FROM ud
        |), il AS (SELECT user_id, count(*) AS len FROM i GROUP BY user_id, isl),
        |mx AS (SELECT user_id, max(len) AS streak_days FROM il GROUP BY user_id)
        |SELECT streak_days, count(*) AS n_users FROM mx GROUP BY streak_days""".stripMargin,
    // head = greatest(1, (n*p) DIV 100) users by DESC spend; exact micros
    "q_revenue_pareto" ->
      """WITH sp AS (
        |  SELECT user_id, sum(CAST(round((value) * 1e6) AS BIGINT)) AS m
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id
        |), rkd AS (
        |  SELECT m, row_number() OVER (ORDER BY m DESC, user_id) AS rk,
        |         count(*) OVER () AS n, CAST(sum(m) OVER () AS BIGINT) AS tot,
        |         CAST(sum(m) OVER (ORDER BY m DESC, user_id ROWS UNBOUNDED PRECEDING)
        |              AS BIGINT) AS cum
        |  FROM sp
        |), cuts AS (SELECT unnest([1, 5, 10, 20]) AS pct)
        |SELECT CAST(cuts.pct AS BIGINT) AS pct, rkd.rk AS k_users,
        |       CAST(floor((cum + 5000) / 10000.0) AS BIGINT) / 100.0 AS head_money,
        |       floor((CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE)) * 1000000.0 + 0.5)
        |         / 1000000.0 AS share
        |FROM rkd JOIN cuts ON rkd.rk = greatest(1, (rkd.n * cuts.pct) // 100)""".stripMargin,
    // deterministic ntile over (n_chars, doc_id); exact-ratio mean
    "q_source_deciles" ->
      """WITH d AS (
        |  SELECT source, doc_id, n_chars,
        |         CAST(ntile(10) OVER (PARTITION BY source ORDER BY n_chars, doc_id)
        |              AS BIGINT) AS decile
        |  FROM documents
        |)
        |SELECT source, decile, count(*) AS n_docs, min(n_chars) AS min_chars,
        |       max(n_chars) AS max_chars,
        |       floor((CAST(sum(n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE))
        |             * 1000000.0 + 0.5) / 1000000.0 AS mean_chars
        |FROM d GROUP BY 1, 2""".stripMargin,
    // generated: theta/x-bar replicated textually so every use is the
    // same IEEE tree; all stats integer cents
    "q_cuped_lift" -> CupedOracleSql,
    // generated: 4-level unnormalized Haar cascade, exact integers
    "q_wavelet_energy" -> WaveletOracleSql,
    // epoch-day dow (0=Monday), never engine dayofweek numbering
    "q_hour_of_week" ->
      """WITH cell AS (
        |  SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 86400 + 3) % 7 AS dow,
        |         (CAST(floor(epoch(ts)) AS BIGINT) // 3600) % 24 AS hour_of_day
        |  FROM events
        |), ag AS (
        |  SELECT dow, hour_of_day, count(*) AS n_events FROM cell GROUP BY 1, 2
        |)
        |SELECT dow, hour_of_day, n_events,
        |       floor(CAST(n_events AS DOUBLE)
        |             / CAST(CAST(sum(n_events) OVER () AS BIGINT) AS DOUBLE)
        |             * 1000000.0 + 0.5) / 1000000.0 AS share
        |FROM ag""".stripMargin,
    // exact micros lags (epoch_ns//1000 ≡ ts_ns DIV 1000), event_id ties
    "q_repurchase_gaps" ->
      """WITH p AS (
        |  SELECT user_id, epoch_ns(ts) // 1000 AS ts_us, event_id
        |  FROM events WHERE event_type = 'purchase'
        |), lg AS (
        |  SELECT ts_us,
        |         lag(ts_us, 1) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
        |           AS prev_us
        |  FROM p
        |)
        |SELECT (ts_us - prev_us) // 3600000000 AS gap_hours, count(*) AS n_gaps
        |FROM lg WHERE prev_us IS NOT NULL GROUP BY 1""".stripMargin,
    // histogram ranks (doubled-rank averages stay integer), integer bracket
    // positions (non-negative, // ≡ DIV), one identically-spelled float
    // interpolation; windowed sums CAST AS BIGINT (DuckDB HUGEINT)
    "q_quantile_normalize" ->
      """WITH d AS (SELECT doc_id, source AS src, n_chars AS v FROM documents),
        |sh AS (SELECT src, v, count(*) AS cnt FROM d GROUP BY src, v),
        |sr AS (
        |  SELECT src, v, cnt,
        |         CAST(coalesce(sum(cnt) OVER (PARTITION BY src ORDER BY v
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |              AS BIGINT) AS cum_below,
        |         CAST(sum(cnt) OVER (PARTITION BY src) AS BIGINT) AS n_s
        |  FROM sh),
        |ph AS (SELECT v, count(*) AS pcnt FROM d GROUP BY v),
        |pp AS (
        |  SELECT v, pcnt,
        |         CAST(coalesce(sum(pcnt) OVER (ORDER BY v
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |              AS BIGINT) AS pcum_below
        |  FROM ph),
        |nt AS (SELECT count(*) AS n_total FROM d),
        |k AS (
        |  SELECT src, v,
        |         CASE WHEN n_s = 1 THEN n_total - 1
        |              ELSE (2*cum_below + cnt - 1) * (n_total - 1) END AS a,
        |         CASE WHEN n_s = 1 THEN 2 ELSE 2*(n_s - 1) END AS dd,
        |         n_total
        |  FROM sr, nt),
        |k2 AS (SELECT src, v, dd, a // dd AS lo, a % dd AS rem,
        |              least(a // dd + 1, n_total - 1) AS hi
        |       FROM k),
        |m AS (
        |  SELECT k2.src, k2.v,
        |         CAST(plo.v AS DOUBLE)
        |           + CAST(k2.rem AS DOUBLE) / CAST(k2.dd AS DOUBLE)
        |             * CAST(phi.v - plo.v AS DOUBLE) AS norm
        |  FROM k2
        |  JOIN pp plo ON k2.lo >= plo.pcum_below AND k2.lo < plo.pcum_below + plo.pcnt
        |  JOIN pp phi ON k2.hi >= phi.pcum_below AND k2.hi < phi.pcum_below + phi.pcnt)
        |SELECT d.doc_id, d.src AS source, d.v AS n_chars, m.norm AS norm_n_chars
        |FROM d JOIN m ON d.src = m.src AND d.v = m.v""".stripMargin,
    // Gopher gate battery: every threshold cross-multiplied to an integer
    // comparison — no float, no rounding, structural hash match
    "q_gopher_gates" -> GopherGatesOracleSql,
    // Gopher A1.2 char-coverage gates: relational replay of the HOF
    // kernels — grams via unnest(range)+list_slice, top-gram by
    // (c DESC, gram ASC) row_number (ties = smallest gram, matching the
    // first-maximal-run fold), dup coverage as DISTINCT position union.
    // All integers until the replayed floor-6 divisions.
    "q_gopher_repetition" -> GopherRepetitionOracleSql,

    // DSIR: md5-48 hashed unigram+bigram buckets, λ and the norm term
    // quantized to integer micros ONCE each (ln replay, TfIdf precedent),
    // per-doc scores exact BIGINT sums, top-25% under (score, id) order
    "q_dsir_scores" ->
      s"""WITH t AS (
         |  SELECT doc_id, (lang = 'en') AS is_t, $TokensSql AS toks FROM documents),
         |pos AS (
         |  SELECT doc_id, is_t,
         |         ('0x' || substring(md5(g), 1, 12))::BIGINT % 1024 AS bk
         |  FROM (SELECT doc_id, is_t,
         |               unnest(toks || list_transform(generate_series(1, len(toks) - 1),
         |                      i -> toks[i] || ' ' || toks[i + 1])) AS g
         |        FROM t)),
         |cnt AS (
         |  SELECT bk, count(*) AS rc, count(*) FILTER (is_t) AS tc
         |  FROM pos GROUP BY bk),
         |lam AS (
         |  SELECT bk, CAST(floor((ln(tc + 1) - ln(rc + 1)) * 1000000.0 + 0.5) AS BIGINT)
         |           AS lam_q
         |  FROM cnt),
         |tots AS (
         |  SELECT count(*) AS r_tot, count(*) FILTER (is_t) AS t_tot FROM pos),
         |gq AS (
         |  SELECT CAST(floor((ln(t_tot + 1024) - ln(r_tot + 1024)) * 1000000.0 + 0.5)
         |              AS BIGINT) AS gq
         |  FROM tots),
         |sc AS (
         |  SELECT doc_id, count(*) AS n_grams, CAST(sum(lam_q) AS BIGINT) AS s_lam
         |  FROM pos JOIN lam USING (bk) GROUP BY doc_id),
         |scored AS (
         |  SELECT doc_id, n_grams, s_lam - n_grams * gq AS score_micro
         |  FROM sc, gq),
         |rk AS (
         |  SELECT *, row_number() OVER (ORDER BY score_micro DESC, doc_id) AS r,
         |         count(*) OVER () AS n
         |  FROM scored)
         |SELECT doc_id, n_grams, score_micro,
         |       (r <= greatest(1, (n * 25) // 100)) AS selected
         |FROM rk""".stripMargin,
    // per-source duplicated-8-gram fraction: aggregated hash tables only,
    // one replayed floor-6 division at the end
    "q_dup_ngram_stats" ->
      s"""WITH t AS (SELECT source, $TokensSql AS toks FROM documents),
         |wh AS (
         |  SELECT source, md5(array_to_string(toks[(pos+1):(pos+8)], ' ')) AS h
         |  FROM (SELECT source, toks, unnest(generate_series(0, len(toks)-8)) AS pos
         |        FROM t WHERE len(toks) >= 8)),
         |sh AS (SELECT source, h, count(*) AS c_sh FROM wh GROUP BY source, h),
         |th AS (SELECT h, CAST(sum(c_sh) AS BIGINT) AS c_h FROM sh GROUP BY h),
         |ag AS (
         |  SELECT sh.source,
         |         CAST(sum(c_sh) AS BIGINT) AS n_positions,
         |         CAST(sum(CASE WHEN c_h >= 2 THEN c_sh ELSE 0 END) AS BIGINT)
         |           AS n_dup_positions
         |  FROM sh JOIN th USING (h) GROUP BY sh.source)
         |SELECT source, n_positions, n_dup_positions,
         |       floor(CAST(n_dup_positions AS DOUBLE) / CAST(n_positions AS DOUBLE)
         |             * 1000000.0 + 0.5) / 1000000.0 AS dup_frac
         |FROM ag""".stripMargin
  )

}
