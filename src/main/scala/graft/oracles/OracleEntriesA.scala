package graft.oracles

import graft.functions.Money
import graft.oracles.SharedCtes._
import graft.oracles.StatsOracles._
import graft.oracles.SeriesOracles._
import graft.oracles.SketchOracles._
import graft.oracles.VectorOracles._
import graft.oracles.TextOracles._
import graft.oracles.GraphOracles._

/** Ordered section 1/6 of the SparkEntry.oracleSql map — moved
  * verbatim (keys included) in the r18 split; SparkEntry.oracleSql
  * is the ordered concatenation of the sections.
  */
private[graft] object OracleEntriesA {
  val entries: Map[String, String] = Map(
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
    // MJPEG frame decode: fixture classes ((doc_id/3) mod 12) joined to
    // their PINNED decoded stats (tools.MjpegOraclePin output — the JDK
    // JPEG codec's deterministic decode of the 12 class byte streams;
    // lossy codec ⇒ no formula replay). Truncated rows (m % 7 = 1) and
    // the class's frame count fall out of the join.
    "q_media_mjpeg_frames" ->
      """WITH v AS (
        |  SELECT doc_id, doc_id // 3 AS m FROM documents WHERE doc_id % 3 = 0),
        |ok AS (SELECT doc_id, (m % 12) AS cls FROM v WHERE m % 7 <> 1),
        |pin(cls, frame_idx, px_sum, x_moment, y_moment) AS (VALUES
        |  (0, 0, 24540, 221430, 153693),
        |  (1, 0, 80676, 1095597, 682917),
        |  (1, 1, 110427, 1452726, 906693),
        |  (2, 0, 165021, 3041661, 1793676),
        |  (3, 0, 114246, 2729163, 676575),
        |  (3, 1, 150171, 3447768, 874530),
        |  (4, 0, 40623, 360234, 355863),
        |  (5, 0, 116127, 1557201, 1269756),
        |  (5, 1, 154557, 2018388, 1636425),
        |  (6, 0, 73044, 1391658, 440415),
        |  (7, 0, 176100, 4144425, 1452693),
        |  (7, 1, 226539, 5153418, 1832061),
        |  (8, 0, 60405, 528429, 683202),
        |  (9, 0, 50814, 700653, 307911),
        |  (9, 1, 72003, 954978, 424674),
        |  (10, 0, 115191, 2155458, 969609),
        |  (11, 0, 247455, 5748897, 2633220),
        |  (11, 1, 312094, 7032039, 3245581))
        |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
        |       CAST(px_sum AS BIGINT) AS px_sum,
        |       CAST(x_moment AS BIGINT) AS x_moment,
        |       CAST(y_moment AS BIGINT) AS y_moment
        |FROM ok JOIN pin USING (cls)""".stripMargin,
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
    // WoE/IV replay: per-user bins, exact class counts, ONE ln per
    // defined bin floor-6 quantized (Markov-entropy ln precedent), IV
    // terms e6-BIGINT before the total (never aggregate doubles)
    "q_woe_bins" ->
      s"""$WoeBinsCte
         |SELECT bin, n_pos, n_neg, woe, iv_e6 FROM w""".stripMargin,
    "q_feature_iv" ->
      s"""$WoeBinsCte
         |SELECT CAST(count(*) AS BIGINT) AS n_bins,
         |       CAST(coalesce(sum(CASE WHEN woe IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT)
         |         AS n_defined_bins,
         |       CAST(coalesce(sum(iv_e6), 0) AS BIGINT) AS iv_e6
         |FROM w""".stripMargin,
  )
}
