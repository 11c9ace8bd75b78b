package graft.oracles

import graft.functions.Money
import graft.oracles.SharedCtes._
import graft.oracles.StatsOracles._
import graft.oracles.SeriesOracles._
import graft.oracles.SketchOracles._
import graft.oracles.VectorOracles._
import graft.oracles.TextOracles._
import graft.oracles.GraphOracles._

/** Ordered section 5/6 of the SparkEntry.oracleSql map — moved
  * verbatim (keys included) in the r18 split; SparkEntry.oracleSql
  * is the ordered concatenation of the sections.
  */
private[graft] object OracleEntriesE {
  val entries: Map[String, String] = Map(
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
  )
}
