package graft.oracles

import graft.functions.Money
import graft.oracles.SharedCtes._
import graft.oracles.StatsOracles._
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
    // token-bucket replay: per-user recursive CTE stepping the exact
    // micro-token recurrence — gap-capped refill with truncating //
    // (non-negative operands, DIV ≡ //), spend-on-admit only. Constants
    // derived from the SAME parameters as the query (cap 1 token,
    // 278 micro/s) so the two sides cannot drift.
    "q_rate_limit" -> {
      val cost = 1000000L
      val cap = 1L * cost
      val rate = 278L
      val dtCap = cap / rate * 1000000L + 1000000L
      s"""WITH RECURSIVE e AS (
         |  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us
         |  FROM events WHERE user_id % 20 = 0),
         |r AS MATERIALIZED (
         |  SELECT user_id, event_id, ts_us,
         |         row_number() OVER (PARTITION BY user_id
         |                            ORDER BY ts_us, event_id) AS rn
         |  FROM e),
         |walk AS (
         |  SELECT user_id, event_id, ts_us, rn,
         |         $cap >= $cost AS admitted,
         |         CAST(CASE WHEN $cap >= $cost THEN $cap - $cost ELSE $cap END
         |              AS BIGINT) AS tokens
         |  FROM r WHERE rn = 1
         |  UNION ALL
         |  SELECT user_id, event_id, ts_us, rn,
         |         avail >= $cost AS admitted,
         |         CAST(CASE WHEN avail >= $cost THEN avail - $cost ELSE avail END
         |              AS BIGINT) AS tokens
         |  FROM (
         |    SELECT r.user_id, r.event_id, r.ts_us, r.rn,
         |           least($cap, w.tokens
         |                 + least(r.ts_us - w.ts_us, $dtCap) * $rate // 1000000) AS avail
         |    FROM walk w JOIN r ON r.user_id = w.user_id AND r.rn = w.rn + 1))
         |SELECT user_id, event_id, ts_us, admitted,
         |       tokens AS tokens_after_micro
         |FROM walk""".stripMargin
    },
    // Fellegi–Sunter linkage replay: the dirty-twin synthesis, the
    // blocked join (side caps in lockstep with blockPairs), the two
    // agreement predicates (name equality; cents distance via the
    // IEEE-safe floor(x*100+0.5) spelling), the literal milli weights,
    // and the three-way decision — all exact integer/IEEE arithmetic
    "q_linkage_scores" ->
      s"""$LinkageScoredCte
         |SELECT a_id, b_id, agr_name, agr_bal, score_milli, decision
         |FROM sc WHERE score_milli > -1000""".stripMargin,
    "q_linkage_quality" ->
      s"""$LinkageScoredCte,
         |t AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM b),
         |m AS (
         |  SELECT
         |    CAST(coalesce(sum(CASE WHEN a_id = truth_id THEN 1 ELSE 0 END), 0) AS BIGINT)
         |      AS n_cand_truth,
         |    CAST(coalesce(sum(CASE WHEN decision = 'match' THEN 1 ELSE 0 END), 0) AS BIGINT)
         |      AS n_match,
         |    CAST(coalesce(sum(CASE WHEN decision = 'match' AND a_id = truth_id
         |                       THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_match_true,
         |    CAST(coalesce(sum(CASE WHEN decision = 'review' THEN 1 ELSE 0 END), 0) AS BIGINT)
         |      AS n_review
         |  FROM sc)
         |SELECT n_truth, n_cand_truth, n_match, n_match_true, n_review,
         |       CAST(CASE WHEN n_match = 0 THEN 0
         |                 ELSE n_match_true * 1000000 // n_match END AS BIGINT) AS precision_e6,
         |       CAST(CASE WHEN n_truth = 0 THEN 0
         |                 ELSE n_match_true * 1000000 // n_truth END AS BIGINT) AS recall_e6
         |FROM m CROSS JOIN t""".stripMargin,
    // blocking evaluation: candidate/truth counts off the capped join,
    // |A|x|B| from the UNCAPPED side counts, both e6 ratios exact
    "q_linkage_blocking" ->
      s"""$LinkageScoredCte,
         |cc AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_candidates,
         |         CAST(coalesce(sum(CASE WHEN a_id = truth_id THEN 1 ELSE 0 END), 0) AS BIGINT)
         |           AS n_cand_truth
         |  FROM p),
         |na AS (SELECT CAST(count(*) AS BIGINT) AS n_a FROM a0),
         |nb AS (SELECT CAST(count(*) AS BIGINT) AS n_b FROM b)
         |SELECT n_a, n_b, n_candidates, n_cand_truth,
         |       n_a * n_b AS n_all_pairs,
         |       CAST(CASE WHEN n_a * n_b = 0 THEN 0
         |                 ELSE 1000000 - n_candidates * 1000000 // (n_a * n_b) END
         |            AS BIGINT) AS reduction_e6,
         |       CAST(CASE WHEN n_b = 0 THEN 0
         |                 ELSE n_cand_truth * 1000000 // n_b END AS BIGINT) AS completeness_e6
         |FROM cc CROSS JOIN na CROSS JOIN nb""".stripMargin,
    // multi-pass blocking replay: both capped block joins, distinct
    // union of candidates, 3-level name agreement, decision counts
    "q_linkage_multipass" ->
      """WITH a0 AS (
        |  SELECT c_custkey AS a_id, c_name AS a_name, c_nationkey AS nationkey,
        |         c_mktsegment AS mktsegment, c_acctbal AS a_acctbal,
        |         substring(c_name, 10, 8) AS pfx
        |  FROM customer),
        |b AS (
        |  SELECT c_custkey + 5000000 AS b_id, c_custkey AS truth_id,
        |         CASE WHEN c_custkey % 2 = 1 THEN c_name || 'x' ELSE c_name END AS b_name,
        |         c_nationkey AS nationkey,
        |         CASE WHEN c_custkey % 5 = 1 THEN 'OTHER' ELSE c_mktsegment END AS mktsegment,
        |         c_acctbal + CAST(c_custkey % 7 - 3 AS DOUBLE) * CAST(0.5 AS DOUBLE) AS b_acctbal,
        |         substring(CASE WHEN c_custkey % 2 = 1 THEN c_name || 'x' ELSE c_name END,
        |                   10, 8) AS pfx
        |  FROM customer WHERE c_custkey % 3 = 0),
        |ac1 AS (SELECT * FROM (SELECT a0.*, count(*) OVER (PARTITION BY nationkey, mktsegment) AS bn FROM a0) WHERE bn <= 10000),
        |bc1 AS (SELECT * FROM (SELECT b.*, count(*) OVER (PARTITION BY nationkey, mktsegment) AS bn FROM b) WHERE bn <= 10000),
        |ac2 AS (SELECT * FROM (SELECT a0.*, count(*) OVER (PARTITION BY nationkey, pfx) AS bn FROM a0) WHERE bn <= 10000),
        |bc2 AS (SELECT * FROM (SELECT b.*, count(*) OVER (PARTITION BY nationkey, pfx) AS bn FROM b) WHERE bn <= 10000),
        |cand AS (
        |  SELECT DISTINCT a_id, a_name, a_acctbal, b_id, truth_id, b_name, b_acctbal FROM (
        |    SELECT ac1.a_id, ac1.a_name, ac1.a_acctbal, bc1.b_id, bc1.truth_id,
        |           bc1.b_name, bc1.b_acctbal
        |    FROM ac1 JOIN bc1 USING (nationkey, mktsegment)
        |    UNION ALL
        |    SELECT ac2.a_id, ac2.a_name, ac2.a_acctbal, bc2.b_id, bc2.truth_id,
        |           bc2.b_name, bc2.b_acctbal
        |    FROM ac2 JOIN bc2 USING (nationkey, pfx))),
        |s AS (
        |  SELECT a_id, b_id, truth_id,
        |         (CASE WHEN a_name = b_name THEN 2400
        |               WHEN starts_with(b_name, a_name) OR starts_with(a_name, b_name) THEN 900
        |               ELSE -1800 END)
        |       + (CASE WHEN abs(CAST(floor(a_acctbal * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
        |                      - CAST(floor(b_acctbal * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)) <= 100
        |               THEN 1200 ELSE -1000 END) AS score_milli
        |  FROM cand),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_candidates,
        |         CAST(coalesce(sum(CASE WHEN a_id = truth_id THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_cand_truth,
        |         CAST(coalesce(sum(CASE WHEN score_milli >= 3000 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_match,
        |         CAST(coalesce(sum(CASE WHEN score_milli >= 3000 AND a_id = truth_id THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_match_true,
        |         CAST(coalesce(sum(CASE WHEN score_milli > -1000 AND score_milli < 3000 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_review
        |  FROM s),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM b)
        |SELECT n_truth, n_candidates, n_cand_truth, n_match, n_match_true, n_review,
        |       CAST(CASE WHEN n_truth = 0 THEN 0
        |                 ELSE n_match_true * 1000000 // n_truth END AS BIGINT) AS recall_e6
        |FROM m CROSS JOIN t""".stripMargin,
    // survivorship merge over the confident matches: authoritative name,
    // max cents across sources, source count
    "q_linkage_golden" ->
      s"""$LinkageScoredCte
         |SELECT a_id AS entity_id, a_name AS name,
         |       CAST(CASE WHEN a_cents >= b_cents THEN a_cents ELSE b_cents END AS BIGINT)
         |         AS acctbal_cents,
         |       CAST(2 AS BIGINT) AS n_sources
         |FROM sc WHERE decision = 'match'""".stripMargin,
    // link prediction: same md5-capped purchase graph, per-user integer
    // micro weights (floor(1e6/ln(deg)), floor(1e6/deg)) summed as BIGINT
    "q_link_prediction" ->
      """WITH inter AS (
        |  SELECT DISTINCT user_id,
        |         CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS item_id
        |  FROM events
        |  WHERE event_type = 'purchase' AND regexp_extract(props, '"k": (\d+)', 1) <> ''
        |), capped AS (
        |  SELECT user_id, item_id FROM (
        |    SELECT user_id, item_id,
        |           row_number() OVER (PARTITION BY user_id
        |             ORDER BY ('0x' || substring(md5(CAST(item_id AS VARCHAR)), 1, 12))::BIGINT,
        |                      item_id) AS r
        |    FROM inter)
        |  WHERE r <= 20
        |), degged AS (
        |  SELECT user_id, item_id, count(*) OVER (PARTITION BY user_id) AS deg
        |  FROM capped
        |)
        |SELECT a.item_id AS item_a, b.item_id AS item_b, count(*) AS cn,
        |       CAST(sum(CAST(floor(1000000.0 / ln(CAST(a.deg AS DOUBLE))) AS BIGINT)) AS BIGINT) AS aa_e6,
        |       CAST(sum(CAST(floor(1000000.0 / a.deg) AS BIGINT)) AS BIGINT) AS ra_e6
        |FROM degged a JOIN degged b ON a.user_id = b.user_id AND a.item_id < b.item_id
        |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin,
    // multinomial NB replay: every model parameter an exact integer, the
    // sparse lnE6 decomposition (observed cells + per-doc length term)
    "q_naive_bayes" ->
      s"""WITH base AS (
         |  SELECT doc_id, lang AS cls, $TokensSql AS toks FROM documents
         |), train AS (SELECT * FROM base WHERE doc_id % 5 <> 0),
         |test AS (SELECT * FROM base WHERE doc_id % 5 = 0),
         |cw AS (
         |  SELECT cls, word, count(*) AS cnt
         |  FROM (SELECT cls, unnest(toks) AS word FROM train) GROUP BY 1, 2
         |), cstat AS (
         |  SELECT cls, CAST(sum(cnt) AS BIGINT) AS n_tok FROM cw GROUP BY 1
         |), cdocs AS (SELECT cls, count(*) AS n_docs FROM train GROUP BY 1),
         |v AS (SELECT count(DISTINCT word) AS v_size FROM cw),
         |nt AS (SELECT count(*) AS n_train FROM train),
         |classes AS (
         |  SELECT s.cls AS pred_cls,
         |         CAST(floor(ln(CAST(d.n_docs AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
         |           - CAST(floor(ln(CAST(nt.n_train AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
         |           AS prior_e6,
         |         CAST(floor(ln(CAST(s.n_tok + v.v_size AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
         |           AS denom_e6
         |  FROM cstat s JOIN cdocs d ON s.cls = d.cls CROSS JOIN v CROSS JOIN nt
         |), tw AS (
         |  SELECT doc_id, word, count(*) AS c_w
         |  FROM (SELECT doc_id, unnest(toks) AS word FROM test) GROUP BY 1, 2
         |), dl AS (SELECT doc_id, cls AS true_cls, CAST(len(toks) AS BIGINT) AS len FROM test),
         |s1 AS (
         |  SELECT tw.doc_id, cw.cls AS pred_cls,
         |         CAST(sum(tw.c_w
         |           * CAST(floor(ln(CAST(cw.cnt + 1 AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT))
         |           AS BIGINT) AS s1_e6
         |  FROM tw JOIN cw ON tw.word = cw.word GROUP BY 1, 2
         |), scored AS (
         |  SELECT dl.doc_id, dl.true_cls, c.pred_cls,
         |         coalesce(s1.s1_e6, 0) - dl.len * c.denom_e6 + c.prior_e6 AS score_e6
         |  FROM dl CROSS JOIN classes c
         |  LEFT JOIN s1 ON s1.doc_id = dl.doc_id AND s1.pred_cls = c.pred_cls
         |), pred AS (
         |  SELECT true_cls, pred_cls,
         |         row_number() OVER (PARTITION BY doc_id
         |           ORDER BY score_e6 DESC, pred_cls) AS rk
         |  FROM scored)
         |SELECT true_cls, pred_cls, count(*) AS n_docs
         |FROM pred WHERE rk = 1 GROUP BY 1, 2""".stripMargin,
    // pairwise JSD on the dense top-200 support: exact-integer ratios,
    // per-word summand floor-quantized to half-micros BEFORE the pair sum
    "q_js_divergence" ->
      s"""WITH w AS (SELECT source AS grp, unnest($TokensSql) AS word FROM documents),
         |top AS (
         |  SELECT word FROM (
         |    SELECT word, count(*) AS n FROM w GROUP BY 1
         |    ORDER BY n DESC, word LIMIT 200)
         |), counts AS (
         |  SELECT grp, word, count(*) AS cnt
         |  FROM w JOIN top USING (word) GROUP BY 1, 2
         |), grps AS (SELECT DISTINCT source AS grp FROM documents),
         |dense AS (
         |  SELECT g.grp, t.word, coalesce(c.cnt, 0) AS cnt
         |  FROM grps g CROSS JOIN top t
         |  LEFT JOIN counts c ON c.grp = g.grp AND c.word = t.word
         |), tot AS (SELECT grp, CAST(sum(cnt) AS BIGINT) AS tot FROM dense GROUP BY 1),
         |p AS (
         |  SELECT d.grp, d.word,
         |         CASE WHEN t.tot > 0 THEN CAST(d.cnt AS DOUBLE) / t.tot
         |              ELSE 0.0 END AS p
         |  FROM dense d JOIN tot t ON d.grp = t.grp)
         |SELECT a.grp AS source_a, b.grp AS source_b,
         |       CAST(sum(CAST(floor((
         |           (CASE WHEN a.p > 0 THEN a.p * ln(a.p / ((a.p + b.p) / 2)) ELSE 0.0 END)
         |         + (CASE WHEN b.p > 0 THEN b.p * ln(b.p / ((a.p + b.p) / 2)) ELSE 0.0 END)
         |         ) * 500000.0 + 0.5) AS BIGINT)) AS BIGINT) AS jsd_e6
         |FROM p a JOIN p b ON a.word = b.word AND a.grp < b.grp
         |GROUP BY 1, 2""".stripMargin,
    // TextRank replay: 5 unrolled weighted-PageRank rounds, BIGINT-nanos
    // state (floor(r·w/wd + 0.5) per edge; one float op per node-round)
    "q_textrank_keywords" -> {
      val stops = graft.operators.TextRank.Stopwords.map(w => s"'$w'").mkString(", ")
      val rounds = (1 to 5).map { i =>
        s"""r$i AS MATERIALIZED (
           |  SELECT node,
           |         CAST(floor(CAST(0.15 AS DOUBLE) * 1000000000.0 / (SELECT n FROM nn)
           |              + CAST(0.85 AS DOUBLE) * CAST(s AS DOUBLE) + 0.5) AS BIGINT) AS r
           |  FROM (
           |    SELECT bi.b AS node,
           |           CAST(sum(CAST(floor(CAST(p.r AS DOUBLE) * bi.w / deg.wd + 0.5)
           |                         AS BIGINT)) AS BIGINT) AS s
           |    FROM bi JOIN r${i - 1} p ON p.node = bi.a JOIN deg ON deg.a = bi.a
           |    GROUP BY bi.b))""".stripMargin
      }.mkString(",\n")
      s"""WITH t AS (SELECT doc_id, $TokensSql AS toks FROM documents),
         |allw AS (SELECT unnest(toks) AS word FROM t),
         |nodes AS (
         |  SELECT word FROM (
         |    SELECT word, count(*) AS n FROM allw
         |    WHERE word NOT IN ($stops) GROUP BY 1
         |    ORDER BY n DESC, word LIMIT 100)
         |), adj AS (
         |  SELECT unnest(list_transform(generate_series(2, len(toks)),
         |                i -> struct_pack(w1 := toks[i-1], w2 := toks[i]))) AS b
         |  FROM t WHERE len(toks) >= 2
         |), pairs AS (SELECT b.w1 AS w1, b.w2 AS w2 FROM adj WHERE b.w1 <> b.w2),
         |e AS (
         |  SELECT least(w1, w2) AS src, greatest(w1, w2) AS dst,
         |         CAST(count(*) AS BIGINT) AS w
         |  FROM pairs
         |  JOIN nodes n1 ON n1.word = pairs.w1
         |  JOIN nodes n2 ON n2.word = pairs.w2
         |  GROUP BY 1, 2
         |), bi AS MATERIALIZED (
         |  SELECT src AS a, dst AS b, w FROM e
         |  UNION ALL SELECT dst AS a, src AS b, w FROM e
         |), deg AS MATERIALIZED (SELECT a, CAST(sum(w) AS BIGINT) AS wd FROM bi GROUP BY 1),
         |nn AS (SELECT count(DISTINCT a) AS n FROM bi),
         |r0 AS MATERIALIZED (
         |  SELECT DISTINCT a AS node,
         |         CAST(floor(1000000000.0 / (SELECT n FROM nn) + 0.5) AS BIGINT) AS r
         |  FROM bi),
         |$rounds
         |SELECT word, rank_e9 FROM (
         |  SELECT node AS word, r AS rank_e9,
         |         row_number() OVER (ORDER BY r DESC, node) AS rk
         |  FROM r5)
         |WHERE rk <= 20""".stripMargin
    },
    // four-fifths audit replay: integer-micro rates, NULL impact when
    // nothing survives anywhere
    "q_curation_bias" ->
      s"""WITH flags AS (
         |  SELECT doc_id, source AS grp, len($TokensSql) >= 50 AS keep
         |  FROM documents
         |), rates AS (
         |  SELECT grp, count(*) AS n_docs,
         |         CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
         |  FROM flags GROUP BY 1
         |), r2 AS (
         |  SELECT grp, n_docs, n_keep,
         |         CAST(floor(CAST(n_keep AS DOUBLE) * 1000000.0 / n_docs) AS BIGINT)
         |           AS keep_rate_e6
         |  FROM rates
         |), best AS (SELECT max(keep_rate_e6) AS b FROM r2)
         |SELECT grp, n_docs, n_keep, keep_rate_e6,
         |       CASE WHEN best.b > 0
         |            THEN CAST(floor(CAST(keep_rate_e6 AS DOUBLE) * 1000000.0 / best.b)
         |                      AS BIGINT) END AS impact_e6,
         |       CASE WHEN best.b > 0
         |            THEN CAST(floor(CAST(keep_rate_e6 AS DOUBLE) * 1000000.0 / best.b)
         |                      AS BIGINT) >= 800000 END AS four_fifths_ok
         |FROM r2 CROSS JOIN best""".stripMargin,
    // split-leakage replay: the minhash pair oracle nested (the
    // CurationLedger stage-nesting pattern), md5-fold sides, bounded
    // class aggregates
    "q_split_leakage" ->
      s"""WITH pairs AS MATERIALIZED (
         |  SELECT id1, id2 FROM ($MinhashMd5PairsOracleSql) px
         |), side AS MATERIALIZED (
         |  SELECT doc_id AS id,
         |         ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
         |           % 10 < 8 AS is_train
         |  FROM documents
         |), cls AS MATERIALIZED (
         |  SELECT p.id1, p.id2,
         |         CASE WHEN s1.is_train AND s2.is_train THEN 'train_train'
         |              WHEN NOT s1.is_train AND NOT s2.is_train THEN 'test_test'
         |              ELSE 'cross' END AS split_class
         |  FROM pairs p
         |  JOIN side s1 ON s1.id = p.id1
         |  JOIN side s2 ON s2.id = p.id2
         |), np AS (SELECT split_class, count(*) AS n_pairs FROM cls GROUP BY 1),
         |ex AS (
         |  SELECT split_class, id1 AS id FROM cls
         |  UNION ALL SELECT split_class, id2 AS id FROM cls
         |), nd AS (
         |  SELECT e.split_class,
         |         CAST(count(DISTINCT e.id) AS BIGINT) AS n_docs,
         |         CAST(count(DISTINCT CASE WHEN NOT s.is_train THEN e.id END)
         |              AS BIGINT) AS n_test_docs
         |  FROM ex e JOIN side s ON s.id = e.id GROUP BY 1
         |)
         |SELECT np.split_class, np.n_pairs, nd.n_docs, nd.n_test_docs
         |FROM np JOIN nd ON np.split_class = nd.split_class""".stripMargin,
    // FD discovery replay: exact distinct counts per candidate, one
    // floored strength division
    "q_fd_profile" -> {
      def one(a: String, b: String): String =
        s"""SELECT '$a->$b' AS fd,
           |       count(*) AS ndv_a,
           |       CAST(coalesce(sum(ndv_b), 0) AS BIGINT) AS ndv_ab,
           |       CAST(coalesce(sum(ndv_b - 1), 0) AS BIGINT) AS violations,
           |       CAST(coalesce(sum(ndv_b - 1), 0) AS BIGINT) = 0 AS fd_holds,
           |       CASE WHEN CAST(coalesce(sum(ndv_b), 0) AS BIGINT) > 0
           |            THEN CAST(floor(CAST(count(*) AS DOUBLE) * 1000000.0
           |                            / CAST(coalesce(sum(ndv_b), 0) AS BIGINT))
           |                      AS BIGINT) END AS strength_e6
           |FROM (SELECT $a, count(DISTINCT $b) AS ndv_b FROM customer
           |      WHERE $a IS NOT NULL AND $b IS NOT NULL GROUP BY 1)""".stripMargin
      Seq(("c_custkey", "c_mktsegment"), ("c_mktsegment", "c_nationkey"),
        ("c_nationkey", "c_mktsegment"))
        .map { case (a, b) => one(a, b) }.mkString("\nUNION ALL\n")
    },
    // sortedness replay: chunked adjacent-pair monotonicity, micros time
    "q_sortedness_profile" -> {
      def one(name: String, kSql: String): String =
        s"""SELECT '$name' AS key, count(*) AS n_pairs,
           |       CAST(sum(CASE WHEN k >= p THEN 1 ELSE 0 END) AS BIGINT) AS n_sorted,
           |       CASE WHEN count(*) > 0
           |            THEN CAST(floor(CAST(sum(CASE WHEN k >= p THEN 1 ELSE 0 END) AS DOUBLE)
           |                 * 1000000.0 / count(*)) AS BIGINT) END AS sortedness_e6
           |FROM (
           |  SELECT $kSql AS k,
           |         lag($kSql) OVER (PARTITION BY event_id // 1000
           |                          ORDER BY event_id) AS p
           |  FROM events)
           |WHERE p IS NOT NULL""".stripMargin
      Seq(("ts_us", "epoch_ns(ts) // 1000"), ("user_id", "user_id"),
        ("event_type", "event_type"))
        .map { case (n, k) => one(n, k) }.mkString("\nUNION ALL\n")
    },
    // Hampel median/MAD replay: doubled-unit dyadic medians via the
    // quantile_cont ≡ percentile interpolation (q_value_percentiles
    // precedent), exact comparisons, no rounding
    "q_anomaly_mad" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
        |         count(*) AS n
        |  FROM events GROUP BY 1, 2
        |), med AS (
        |  SELECT event_type, quantile_cont(n * 2, 0.5) AS med_x2
        |  FROM daily GROUP BY 1
        |), dev AS (
        |  SELECT d.event_type, d.day, d.n, m.med_x2,
        |         abs(d.n * 2 - m.med_x2) AS dev_x2
        |  FROM daily d JOIN med m ON d.event_type = m.event_type
        |), mad AS (
        |  SELECT event_type, quantile_cont(dev_x2, 0.5) AS mad_x2
        |  FROM dev GROUP BY 1
        |)
        |SELECT dev.event_type, dev.day, dev.n, dev.med_x2, mad.mad_x2,
        |       dev.dev_x2, dev.dev_x2 > 3.0 * mad.mad_x2 AS is_outlier
        |FROM dev JOIN mad ON dev.event_type = mad.event_type""".stripMargin,
    // transformWithState MapState/ListState static parity: per-type
    // counts + top-3 purchase cents (top-K by value is order-free)
    "q_tws_basket" ->
      """WITH c AS (
        |  SELECT user_id, event_type,
        |         coalesce(CAST(floor(value * 100.0 + 0.5) AS BIGINT), 0) AS cents
        |  FROM events
        |), agg AS (
        |  SELECT user_id, CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
        |         count(*) AS n_events
        |  FROM c GROUP BY 1
        |), topk AS (
        |  SELECT user_id, CAST(coalesce(sum(cents), 0) AS BIGINT) AS topk_cents
        |  FROM (
        |    SELECT user_id, cents,
        |           row_number() OVER (PARTITION BY user_id ORDER BY cents DESC) AS r
        |    FROM c WHERE event_type = 'purchase')
        |  WHERE r <= 3 GROUP BY 1
        |)
        |SELECT a.user_id, a.n_types, a.n_events,
        |       coalesce(t.topk_cents, 0) AS topk_cents
        |FROM agg a LEFT JOIN topk t ON t.user_id = a.user_id""".stripMargin,
    // Apriori k=2 rules on the q_copurchase capped graph: supports and
    // pairs from ONE capped frame, floored e6 ratios, left-assoc lift
    "q_basket_rules" ->
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
        |), sup AS (SELECT item_id, count(*) AS n_item FROM capped GROUP BY 1),
        |nu AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM capped),
        |p AS (
        |  SELECT a.item_id AS item_a, b.item_id AS item_b, count(*) AS n_ab
        |  FROM capped a JOIN capped b
        |    ON a.user_id = b.user_id AND a.item_id < b.item_id
        |  GROUP BY 1, 2 HAVING count(*) >= 2
        |)
        |SELECT p.item_a, p.item_b, p.n_ab, sa.n_item AS n_a, sb.n_item AS n_b,
        |       CAST(floor(CAST(p.n_ab AS DOUBLE) * 1000000.0 / nu.n_users) AS BIGINT)
        |         AS support_e6,
        |       CAST(floor(CAST(p.n_ab AS DOUBLE) * 1000000.0 / sa.n_item) AS BIGINT)
        |         AS conf_ab_e6,
        |       CAST(floor(CAST(p.n_ab AS DOUBLE) * 1000000.0 / sb.n_item) AS BIGINT)
        |         AS conf_ba_e6,
        |       CAST(floor(CAST(p.n_ab AS DOUBLE) * nu.n_users / sa.n_item / sb.n_item
        |            * 1000000.0) AS BIGINT) AS lift_e6
        |FROM p
        |JOIN sup sa ON sa.item_id = p.item_a
        |JOIN sup sb ON sb.item_id = p.item_b
        |CROSS JOIN nu""".stripMargin,
    // half-life-quantized decay: k = Δt div h, weight 1e6 >> k — exact
    // integers, transcendental-free
    "q_decayed_counts" ->
      """WITH e AS (SELECT event_type, epoch_ns(ts) // 1000 AS ts_us FROM events),
        |r AS (SELECT max(ts_us) AS ref FROM e),
        |w AS (
        |  SELECT event_type, ts_us,
        |         CASE WHEN k >= 20 THEN 0
        |              ELSE CAST(floor(1000000.0 / (1 << CAST(k AS INT))) AS BIGINT)
        |         END AS w
        |  FROM (SELECT event_type, ts_us,
        |               CAST(floor(CAST(r.ref - ts_us AS DOUBLE) / 259200000000)
        |                    AS BIGINT) AS k
        |        FROM e CROSS JOIN r)
        |)
        |SELECT event_type, count(*) AS n_events, max(ts_us) AS latest_us,
        |       CAST(sum(w) AS BIGINT) AS score_e6
        |FROM w GROUP BY 1""".stripMargin,
    // Benford replay: integer cents, string-sliced leading digit, shared
    // e6 literals, exact expected mass, floor-6 χ² terms
    "q_benford_audit" -> {
      val values = graft.operators.Benford.PE6.zipWithIndex
        .map { case (p, i) => s"(${i + 1}, $p)" }.mkString(", ")
      s"""WITH cents AS (
         |  SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS c FROM orders
         |), obs AS (
         |  SELECT CAST(substring(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit,
         |         count(*) AS n_obs
         |  FROM cents WHERE c >= 1 GROUP BY 1
         |), n AS (SELECT CAST(sum(n_obs) AS BIGINT) AS nn FROM obs),
         |p(digit, p_e6) AS (VALUES $values),
         |j AS (
         |  SELECT p.digit, coalesce(o.n_obs, 0) AS n_obs, p.p_e6, n.nn,
         |         CAST(coalesce(o.n_obs, 0) AS DOUBLE) - n.nn * p.p_e6 / 1000000.0
         |           AS dev,
         |         n.nn * p.p_e6 / 1000000.0 AS e
         |  FROM p LEFT JOIN obs o ON o.digit = p.digit CROSS JOIN n
         |)
         |SELECT CAST(digit AS BIGINT) AS digit, CAST(n_obs AS BIGINT) AS n_obs,
         |       CAST(p_e6 AS BIGINT) AS p_e6,
         |       CAST(nn * p_e6 AS BIGINT) AS expected_e6,
         |       CAST(floor(dev * dev / e * 1000000.0 + 0.5) AS BIGINT)
         |         AS chi2_term_e6
         |FROM j""".stripMargin
    },
    // partition pruning: the RESULT is layout-independent (the
    // PartitionFilters pin lives in PartitionedLayoutSpec)
    "q_partition_pruning" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |       CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
        |         AS total_value_e6
        |FROM events WHERE event_type = 'purchase' GROUP BY 1""".stripMargin,
    // bucket pruning: the RESULT is layout-independent (the 1-of-8
    // SelectedBucketsCount pin lives in BucketedJoinSpec)
    "q_bucket_pruning" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE c_custkey = 7""".stripMargin,
    // 2-D skyline sweep replay: cumulative max over the identical
    // (minv, maxv DESC, id) order, frontier = rows beating the run-max
    "q_brand_skyline" ->
      """WITH base AS (
        |  SELECT p_brand AS grp, p_partkey AS id, p_retailprice AS minv,
        |         CAST(p_size AS BIGINT) AS maxv
        |  FROM part
        |), sweep AS (
        |  SELECT grp, id, minv, maxv,
        |         max(maxv) OVER (PARTITION BY grp ORDER BY minv, maxv DESC, id
        |                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |           AS runmax
        |  FROM base
        |), sky AS (SELECT * FROM sweep WHERE runmax IS NULL OR maxv > runmax)
        |SELECT grp AS p_brand, id AS p_partkey, minv AS p_retailprice,
        |       maxv AS p_size,
        |       CAST(row_number() OVER (PARTITION BY grp
        |              ORDER BY minv, maxv DESC, id) AS BIGINT) AS sky_rank
        |FROM sky""".stripMargin,
    // Markov removal-effect replay: journey transitions, then 8 unrolled
    // integer-mass rounds per chain (full + 3 removals; original
    // denominators) — m·cnt//out on non-negative BIGINTs, absorbing
    // states carry forward
    "q_markov_attribution" -> {
      def steps(tag: String, edgeCte: String): String = (1 to 8).map { i =>
        val prev = if (i == 1) s"${tag}0" else s"$tag${i - 1}"
        s"""$tag$i AS MATERIALIZED (
           |  SELECT state, CAST(sum(mass) AS BIGINT) AS mass FROM (
           |    SELECT w.dst AS state, m.mass * w.cnt // w.outc AS mass
           |    FROM $prev m JOIN $edgeCte w
           |      ON w.src = m.state AND m.state NOT IN ('conv', 'null')
           |    UNION ALL
           |    SELECT state, mass FROM $prev WHERE state IN ('conv', 'null')
           |  ) GROUP BY 1)""".stripMargin
      }.mkString(",\n")
      val chains = Seq(
        "f" -> "ew",
        "rv" -> "ewv", "rc" -> "ewc", "rs" -> "ews")
        .map { case (tag, e) =>
          s"${tag}0 AS (SELECT 'start' AS state, CAST(1000000000 AS BIGINT) AS mass),\n" +
            steps(tag, e)
        }.mkString(",\n")
      s"""WITH ev AS (
         |  SELECT user_id, event_type AS st, epoch_ns(ts) // 1000 AS ts_us, event_id
         |  FROM events
         |), fp AS (
         |  SELECT user_id, ts_us, event_id FROM (
         |    SELECT user_id, ts_us, event_id,
         |           row_number() OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS r
         |    FROM ev WHERE st = 'purchase') WHERE r = 1
         |), kept AS (
         |  SELECT e.user_id,
         |         CASE WHEN e.st = 'purchase' THEN 'conv' ELSE e.st END AS state,
         |         e.ts_us, e.event_id, fp.user_id IS NOT NULL AS has_conv
         |  FROM ev e LEFT JOIN fp ON fp.user_id = e.user_id
         |  WHERE fp.user_id IS NULL
         |     OR e.ts_us < fp.ts_us OR (e.ts_us = fp.ts_us AND e.event_id <= fp.event_id)
         |), pairs AS (
         |  SELECT coalesce(lag(state) OVER (PARTITION BY user_id ORDER BY ts_us, event_id),
         |                  'start') AS src,
         |         state AS dst
         |  FROM kept
         |), tails AS (
         |  SELECT state AS src, 'null' AS dst FROM (
         |    SELECT state, row_number() OVER (PARTITION BY user_id
         |             ORDER BY ts_us DESC, event_id DESC) AS r
         |    FROM kept WHERE NOT has_conv) WHERE r = 1
         |), e AS MATERIALIZED (
         |  SELECT src, dst, CAST(count(*) AS BIGINT) AS cnt
         |  FROM (SELECT * FROM pairs UNION ALL SELECT * FROM tails) GROUP BY 1, 2
         |), outt AS MATERIALIZED (SELECT src, CAST(sum(cnt) AS BIGINT) AS outc FROM e GROUP BY 1),
         |ew AS MATERIALIZED (SELECT e.src, e.dst, e.cnt, o.outc FROM e JOIN outt o ON o.src = e.src),
         |ewv AS (SELECT * FROM ew WHERE src <> 'view' AND dst <> 'view'),
         |ewc AS (SELECT * FROM ew WHERE src <> 'click' AND dst <> 'click'),
         |ews AS (SELECT * FROM ew WHERE src <> 'signup' AND dst <> 'signup'),
         |$chains,
         |pf AS (SELECT coalesce((SELECT mass FROM f8 WHERE state = 'conv'), 0) AS p),
         |res AS (
         |  SELECT 'view' AS channel,
         |         coalesce((SELECT mass FROM rv8 WHERE state = 'conv'), 0) AS p_rem
         |  UNION ALL
         |  SELECT 'click', coalesce((SELECT mass FROM rc8 WHERE state = 'conv'), 0)
         |  UNION ALL
         |  SELECT 'signup', coalesce((SELECT mass FROM rs8 WHERE state = 'conv'), 0)
         |), tot AS (SELECT CAST(sum((SELECT p FROM pf) - p_rem) AS BIGINT) AS t FROM res)
         |SELECT channel,
         |       CAST((SELECT p FROM pf) AS BIGINT) AS p_full_e9,
         |       CAST(p_rem AS BIGINT) AS p_removed_e9,
         |       CAST((SELECT p FROM pf) - p_rem AS BIGINT) AS removal_e9,
         |       CASE WHEN tot.t > 0
         |            THEN CAST(floor(CAST((SELECT p FROM pf) - p_rem AS DOUBLE)
         |                 * 1000000.0 / tot.t) AS BIGINT) END AS share_e6
         |FROM res CROSS JOIN tot""".stripMargin
    },
    // exact Shapley replay: coalition masks, 8-row rate table, the 12
    // literal (channel, S, S∪{i}, 6·weight) marginal terms
    "q_shapley_attribution" ->
      """WITH m AS (
        |  SELECT user_id,
        |         max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |         + max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) * 2
        |         + max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) * 4 AS mask,
        |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY 1
        |), rates AS (
        |  SELECT mask,
        |         CAST(floor(CAST(sum(conv) AS DOUBLE) * 1000000.0 / count(*)) AS BIGINT)
        |           AS rate_e6
        |  FROM m GROUP BY 1
        |), terms(channel, mask_without, mask_with, coef6) AS (
        |  VALUES ('view',0,1,2),('view',2,3,1),('view',4,5,1),('view',6,7,2),
        |         ('click',0,2,2),('click',1,3,1),('click',4,6,1),('click',5,7,2),
        |         ('signup',0,4,2),('signup',1,5,1),('signup',2,6,1),('signup',3,7,2)
        |)
        |SELECT t.channel,
        |       CAST(sum(t.coef6 * (coalesce(w.rate_e6, 0) - coalesce(wo.rate_e6, 0)))
        |            AS BIGINT) AS phi6_e6,
        |       CAST(sum(CASE WHEN w.rate_e6 IS NOT NULL OR wo.rate_e6 IS NOT NULL
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_terms
        |FROM terms t
        |LEFT JOIN rates w ON w.mask = t.mask_with
        |LEFT JOIN rates wo ON wo.mask = t.mask_without
        |GROUP BY 1""".stripMargin,
    // t-closeness EMD replay: dense class×bin frame, BIGINT cumsums,
    // integer |cumP·N − cumQ·n_g| terms, one double division per class
    "q_t_closeness" ->
      s"""WITH $PrivacyQiSql,
         |base AS (SELECT seg, band AS sv FROM qi),
         |bins AS (SELECT DISTINCT sv FROM base),
         |mm AS (SELECT count(*) AS m FROM bins),
         |nt AS (SELECT count(*) AS n_total FROM base),
         |gl AS (SELECT sv, count(*) AS q_cnt FROM base GROUP BY 1),
         |cls AS (SELECT seg, count(*) AS n_g FROM base GROUP BY 1),
         |cells AS (SELECT seg, sv, count(*) AS cnt FROM base GROUP BY 1, 2),
         |dense AS (
         |  SELECT c.seg, c.n_g, b.sv, coalesce(x.cnt, 0) AS cnt, g.q_cnt, nt.n_total
         |  FROM cls c CROSS JOIN bins b
         |  LEFT JOIN cells x ON x.seg = c.seg AND x.sv = b.sv
         |  JOIN gl g ON g.sv = b.sv
         |  CROSS JOIN nt
         |), cum AS (
         |  SELECT seg, n_g, n_total,
         |         CAST(sum(cnt) OVER (PARTITION BY seg ORDER BY sv) AS BIGINT) AS cum_p,
         |         CAST(sum(q_cnt) OVER (PARTITION BY seg ORDER BY sv) AS BIGINT) AS cum_q
         |  FROM dense
         |), agg AS (
         |  SELECT seg, n_g, n_total,
         |         CAST(sum(abs(cum_p * n_total - cum_q * n_g)) AS BIGINT) AS t_num
         |  FROM cum GROUP BY 1, 2, 3
         |)
         |SELECT seg, n_g,
         |       CAST(floor(CAST(t_num AS DOUBLE) * 1000000.0
         |            / (CAST((SELECT m FROM mm) - 1 AS DOUBLE) * n_g * n_total))
         |            AS BIGINT) AS t_e6,
         |       CAST(floor(CAST(t_num AS DOUBLE) * 1000000.0
         |            / (CAST((SELECT m FROM mm) - 1 AS DOUBLE) * n_g * n_total))
         |            AS BIGINT) <= 200000 AS t_ok
         |FROM agg""".stripMargin,
    // bucketed co-located join: the RESULT is layout-independent (the
    // plan pin lives in BucketedJoinSpec); plain join replay
    "q_bucketed_join" ->
      s"""SELECT c_mktsegment, count(*) AS n_orders,
         |       ${Money.sumSql("o_totalprice")} AS revenue
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY 1""".stripMargin,
    // RangePartitioner-plan replay: md5 sample, rank cut points, collapse
    // duplicate boundaries, then the full-table per-range audit
    "q_range_bounds" ->
      """WITH samp AS (
        |  SELECT user_id AS k, event_id AS id FROM events
        |  WHERE ('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 12))::BIGINT % 20 = 0
        |), n AS (SELECT count(*) AS ns FROM samp),
        |ranked AS (
        |  SELECT k, row_number() OVER (ORDER BY k, id) AS rn FROM samp
        |), cuts AS (
        |  SELECT DISTINCT CAST(floor(i * (SELECT ns FROM n) / 32.0) AS BIGINT) AS rn
        |  FROM range(1, 32) t(i)
        |  WHERE CAST(floor(i * (SELECT ns FROM n) / 32.0) AS BIGINT) >= 1
        |), bounds AS (SELECT DISTINCT ranked.k AS bk FROM ranked JOIN cuts USING (rn)),
        |assigned AS (
        |  SELECT e.user_id AS k,
        |         1 + (SELECT count(*) FROM bounds WHERE bk < e.user_id) AS bucket
        |  FROM events e
        |), per AS (
        |  SELECT bucket, count(*) AS n_rows, min(k) AS min_key, max(k) AS max_key
        |  FROM assigned GROUP BY 1
        |), tot AS (SELECT count(*) AS t FROM events)
        |SELECT CAST(bucket AS BIGINT) AS bucket, n_rows, min_key, max_key,
        |       CAST(floor(CAST(n_rows AS DOUBLE) * 1000000.0 / tot.t) AS BIGINT) AS share_e6
        |FROM per CROSS JOIN tot""".stripMargin,
  )
}
