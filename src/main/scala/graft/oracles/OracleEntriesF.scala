package graft.oracles

import graft.functions.Money
import graft.oracles.SharedCtes._
import graft.oracles.StatsOracles._
import graft.oracles.SeriesOracles._
import graft.oracles.SketchOracles._
import graft.oracles.VectorOracles._
import graft.oracles.TextOracles._
import graft.oracles.GraphOracles._

/** Ordered section 6/6 of the SparkEntry.oracleSql map — moved
  * verbatim (keys included) in the r18 split; SparkEntry.oracleSql
  * is the ordered concatenation of the sections.
  */
private[graft] object OracleEntriesF {
  val entries: Map[String, String] = Map(
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
         |FROM ag""".stripMargin,
    // batch replay of the TTL stream dedup: one group per key in a batch
    // run, TTL never lapses, min(payload) admitted — exactly GROUP BY
    "q_stream_dedup_ttl" ->
      """SELECT md5(text) AS key, CAST(min(doc_id) AS BIGINT) AS payload
        |FROM documents GROUP BY 1""".stripMargin,
    // pixel-formula replay of the decoded-frame dHash: nearest-neighbor
    // 9×8 gray resample (sx = x·w//9, sy = y·h//8 — non-negative, so
    // DuckDB // ≡ the decoder's Int division), 64 difference bits via a
    // gx vs gx+1 self-join, packed into 4×16-bit bands
    "q_media_avi_phash" ->
      """WITH v AS (
        |  SELECT doc_id,
        |         7 + (doc_id % 4) * 4 AS w,
        |         6 + (doc_id % 3) * 4 AS h,
        |         2 + doc_id % 3 AS nf
        |  FROM documents WHERE doc_id % 3 = 2 AND doc_id % 2 = 0),
        |f AS (SELECT doc_id, w, h, unnest(range(0, nf)) AS fi FROM v),
        |gy AS (SELECT doc_id, w, h, fi, unnest(range(0, 8)) AS y FROM f),
        |gx AS (SELECT doc_id, w, h, fi, y, unnest(range(0, 9)) AS x FROM gy),
        |gr AS (SELECT doc_id, fi, y, x,
        |         (  (doc_id + 31 * fi + 7 * ((y * h) // 8) + 3 * ((x * w) // 9)) % 251
        |          + (doc_id + 31 * fi + 7 * ((y * h) // 8) + 3 * ((x * w) // 9) + 11) % 251
        |          + (doc_id + 31 * fi + 7 * ((y * h) // 8) + 3 * ((x * w) // 9) + 22) % 251
        |         ) // 3 AS g
        |       FROM gx),
        |bt AS (SELECT a.doc_id, a.fi, a.y, a.x,
        |         CASE WHEN b.g > a.g THEN 1 ELSE 0 END AS bit
        |       FROM gr a JOIN gr b ON b.doc_id = a.doc_id AND b.fi = a.fi
        |                          AND b.y = a.y AND b.x = a.x + 1
        |       WHERE a.x < 8)
        |SELECT doc_id, CAST(fi AS BIGINT) AS frame_idx,
        |       CAST((y * 8 + x) // 16 AS INT) AS band_idx,
        |       CAST(sum(bit << CAST((y * 8 + x) % 16 AS INT)) AS BIGINT) AS band_val
        |FROM bt GROUP BY 1, 2, 3""".stripMargin,
    "q_bleu_corpus" -> EvalOracles.BleuOracleSql,
    "q_rouge_corpus" -> EvalOracles.RougeOracleSql,
    "q_bradley_terry" -> EvalOracles.BradleyTerryOracleSql,
    "q_fleiss_kappa" -> EvalOracles.FleissKappaOracleSql,
    "q_pass_at_k" -> EvalOracles.PassAtKOracleSql,
    "q_chrf_corpus" -> EvalOracles.ChrFOracleSql,
    "q_krippendorff_alpha" -> EvalOracles.KrippendorffOracleSql,
    "q_holt_winters" -> HoltWintersOracleSql,
    "q_cusum_chart" -> CusumOracleSql,
    "q_forecast_mase" -> HoltWintersMaseOracleSql,
    "q_rank_correlation" -> RankCorrelationOracleSql,
  )
}
