package graft.oracles

import graft.functions.Money
import graft.oracles.SharedCtes._
import graft.oracles.StatsOracles._
import graft.oracles.SketchOracles._
import graft.oracles.VectorOracles._
import graft.oracles.TextOracles._
import graft.oracles.GraphOracles._

/** Ordered section 3/6 of the SparkEntry.oracleSql map — moved
  * verbatim (keys included) in the r18 split; SparkEntry.oracleSql
  * is the ordered concatenation of the sections.
  */
private[graft] object OracleEntriesC {
  val entries: Map[String, String] = Map(
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
    // generated md5-lane LSH PAIR replay: exact-lane band keys, bucket
    // cap, exact-Jaccard verify — the pair stage itself hash-oracled
    "q_minhash_pairs" -> MinhashMd5PairsOracleSql,
    // generated md5-48 SimHash PAIR replay: 4×12-bit chunk buckets,
    // exact Hamming ≤ 3 (complete recall by pigeonhole)
    "q_simhash_pairs" -> SimhashMd5PairsOracleSql,
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
    "q_semantic_decontaminate" -> SemanticDecontOracleSql,
    "q_semantic_decont_fraction" -> SemanticDecontFractionOracleSql,
    "q_als_det" -> AlsOracles.AlsDetOracleSql,
    "q_als_implicit" -> AlsOracles.AlsImplicitOracleSql,
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
  )
}
