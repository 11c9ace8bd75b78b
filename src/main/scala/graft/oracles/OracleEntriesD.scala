package graft.oracles

import graft.functions.Money
import graft.oracles.SharedCtes._
import graft.oracles.StatsOracles._
import graft.oracles.SeriesOracles._
import graft.oracles.SketchOracles._
import graft.oracles.VectorOracles._
import graft.oracles.TextOracles._
import graft.oracles.GraphOracles._

/** Ordered section 4/6 of the SparkEntry.oracleSql map — moved
  * verbatim (keys included) in the r18 split; SparkEntry.oracleSql
  * is the ordered concatenation of the sections.
  */
private[graft] object OracleEntriesD {
  val entries: Map[String, String] = Map(
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
    // left-outer twin: unmatched views keep null (buy_id, lag_us)
    "q_stream_join_outer" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_ns(ts) // 1000 AS us FROM events),
        |v AS (SELECT user_id, event_id AS view_id, us AS v_us FROM e WHERE event_type = 'view'),
        |b AS (SELECT user_id, event_id AS buy_id, us AS b_us FROM e WHERE event_type = 'purchase')
        |SELECT v.user_id, v.view_id, b.buy_id, b.b_us - v.v_us AS lag_us
        |FROM v LEFT JOIN b ON v.user_id = b.user_id
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
    // MERGE/upsert apply: last-writer change per key (distinct seqs by
    // construction — no window tie), full-outer join vs base, precedence
    // CASE; mirrors operators.MergeApply.audit exactly
    "q_merge_apply" ->
      """WITH base AS (SELECT doc_id, text FROM documents),
        |ch AS (
        |  SELECT doc_id, 1 AS seq, 'U' AS op, text || ' v2' AS text
        |  FROM base WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id, 2 AS seq, 'D' AS op, CAST(NULL AS VARCHAR) AS text
        |  FROM base WHERE doc_id % 11 = 0
        |  UNION ALL
        |  SELECT doc_id, 1 AS seq, 'U' AS op, text
        |  FROM base WHERE doc_id % 17 = 0 AND doc_id % 7 <> 0 AND doc_id % 11 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, 1 AS seq, 'U' AS op,
        |         text || ' new' AS text
        |  FROM base WHERE doc_id % 13 = 0),
        |latest AS (
        |  SELECT doc_id, op AS _op, text AS _new FROM ch
        |  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY seq DESC) = 1),
        |j AS (
        |  SELECT coalesce(b.doc_id, l.doc_id) AS doc_id, b.text AS _old,
        |         l._op, l._new
        |  FROM base b FULL OUTER JOIN latest l ON b.doc_id = l.doc_id)
        |SELECT doc_id,
        |       CASE WHEN _op IS NULL THEN 'keep'
        |            WHEN _op = 'D' THEN 'delete'
        |            WHEN _old IS NULL THEN 'insert'
        |            WHEN _old IS NOT DISTINCT FROM _new THEN 'noop'
        |            ELSE 'update' END AS action,
        |       CASE WHEN _op = 'D' THEN CAST(NULL AS VARCHAR)
        |            WHEN _op IS NULL THEN md5(_old)
        |            ELSE md5(_new) END AS text_md5
        |FROM j""".stripMargin,
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
  )
}
