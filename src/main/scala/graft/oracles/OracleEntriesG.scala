package graft.oracles

import graft.functions.Money
import graft.oracles.SharedCtes._
import graft.oracles.StatsOracles._
import graft.oracles.SeriesOracles._
import graft.oracles.SketchOracles._
import graft.oracles.VectorOracles._
import graft.oracles.TextOracles._
import graft.oracles.GraphOracles._

/** Ordered section 7/7 of the SparkEntry.oracleSql map — the r22
  * record-linkage batch and everything after it, split VERBATIM out of
  * OracleEntriesF.scala (r23 hygiene split before the file re-created the
  * 10.5k-line SparkEntry problem); keys and SQL unchanged, hashes
  * unchanged.
  */
private[graft] object OracleEntriesG {
  val entries: Map[String, String] = Map(
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
    // memorization audit replay: candidate classes built from token
    // LISTS (the Spark side space-joins the same slices, and
    // re-tokenization of a space-joined token list is identity), the
    // SubstrSpansSql window/islands spelling keyed by cand_id, corpus
    // windows distinct-hashed, LEFT join so clean candidates report zeros
    "q_memorization" ->
      s"""WITH t AS (SELECT doc_id, $TokensSql AS toks FROM documents),
         |cand AS (
         |  SELECT doc_id + 3000000 AS cand_id, toks FROM t WHERE doc_id % 20 = 3
         |  UNION ALL
         |  SELECT doc_id + 4000000 AS cand_id,
         |         list_concat(toks[1:(len(toks)+1)//2],
         |                     ['zqnovelx','zqnovely','zqnovelz']) AS toks
         |  FROM t WHERE doc_id % 20 = 7
         |  UNION ALL
         |  SELECT doc_id + 5000000 AS cand_id, list_reverse(toks) AS toks
         |  FROM t WHERE doc_id % 20 = 11),
         |corp AS MATERIALIZED (
         |  SELECT DISTINCT md5(array_to_string(toks[(pos+1):(pos+8)], ' ')) AS h
         |  FROM (SELECT toks, unnest(generate_series(0, len(toks)-8)) AS pos
         |        FROM t WHERE len(toks) >= 8)),
         |cw AS (
         |  SELECT cand_id, pos, md5(array_to_string(toks[(pos+1):(pos+8)], ' ')) AS h
         |  FROM (SELECT cand_id, toks, unnest(generate_series(0, len(toks)-8)) AS pos
         |        FROM cand WHERE len(toks) >= 8)),
         |hits AS (SELECT cw.cand_id, cw.pos FROM cw JOIN corp USING (h)),
         |fl AS (
         |  SELECT cand_id, pos,
         |         CASE WHEN pos > coalesce(max(pos + 7) OVER (PARTITION BY cand_id ORDER BY pos
         |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -2) + 1
         |              THEN 1 ELSE 0 END AS ns
         |  FROM hits),
         |isl AS (
         |  SELECT cand_id, pos,
         |         sum(ns) OVER (PARTITION BY cand_id ORDER BY pos
         |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
         |  FROM fl),
         |spans AS (
         |  SELECT cand_id, min(pos) AS span_start, max(pos) + 7 AS span_end
         |  FROM isl GROUP BY cand_id, g),
         |per AS (
         |  SELECT cand_id, CAST(count(*) AS BIGINT) AS n_spans,
         |         CAST(sum(span_end - span_start + 1) AS BIGINT) AS n_mem_tokens,
         |         CAST(max(span_end - span_start + 1) AS BIGINT) AS longest_span
         |  FROM spans GROUP BY cand_id)
         |SELECT c.cand_id AS doc_id, CAST(len(c.toks) AS BIGINT) AS n_tokens,
         |       coalesce(p.n_spans, 0) AS n_spans,
         |       coalesce(p.n_mem_tokens, 0) AS n_mem_tokens,
         |       coalesce(p.longest_span, 0) AS longest_span,
         |       CAST(CASE WHEN len(c.toks) > 0
         |            THEN coalesce(p.n_mem_tokens, 0) * 1000000 // len(c.toks)
         |            ELSE 0 END AS BIGINT) AS mem_frac_e6
         |FROM cand c LEFT JOIN per p USING (cand_id)""".stripMargin,
    // debiased Sinkhorn OT divergence (SeriesOracles generator): three
    // unrolled 5-round entropic solves over the drift bucket chain
    "q_sinkhorn_divergence" -> SinkhornOracleSql,
    // transitive-merge audit over the SAME DedupCompCte chain as
    // q_dedup_components — per multi-doc component: size, direct-edge
    // count, weakest link, completeness micros (all exact integers)
    "q_dup_cluster_audit" ->
      s"""$DedupCompCte,
         |ec AS (SELECT comp.component, e.n_shared
         |       FROM e JOIN comp ON comp.node = e.src),
         |es AS (SELECT component, CAST(count(*) AS BIGINT) AS n_edges,
         |              CAST(min(n_shared) AS BIGINT) AS min_shared
         |       FROM ec GROUP BY 1),
         |ns AS (SELECT component, CAST(count(*) AS BIGINT) AS n_nodes
         |       FROM comp GROUP BY 1)
         |SELECT ns.component, ns.n_nodes, es.n_edges, es.min_shared,
         |       CAST(es.n_edges * 2000000 // (ns.n_nodes * (ns.n_nodes - 1))
         |            AS BIGINT) AS completeness_e6
         |FROM ns JOIN es USING (component)""".stripMargin,
    // vocabulary-richness spectrum: exact BIGINT count-of-counts, Chao1 /
    // Good–Turing as integer floor-division micros (non-negative operands
    // so Spark DIV ≡ DuckDB //), zero floats anywhere
    "q_vocab_richness" ->
      s"""WITH w AS (SELECT source AS grp, unnest($TokensSql) AS word FROM documents),
         |wc AS (SELECT grp, word, CAST(count(*) AS BIGINT) AS cnt
         |       FROM w GROUP BY 1, 2),
         |per AS (
         |  SELECT grp, CAST(sum(cnt) AS BIGINT) AS n_tokens,
         |         CAST(count(*) AS BIGINT) AS d_types,
         |         CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
         |         CAST(sum(CASE WHEN cnt = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
         |  FROM wc GROUP BY grp)
         |SELECT grp AS source, n_tokens, d_types, f1, f2,
         |       CAST(d_types * 1000000
         |            + f1 * (f1 - 1) * 1000000 // (2 * (f2 + 1)) AS BIGINT)
         |         AS chao1_e6,
         |       CAST(f1 * 1000000 // n_tokens AS BIGINT) AS gt_unseen_e6
         |FROM per""".stripMargin,
    // greedy facility-location coreset replay (VectorOracles generator):
    // 8 unrolled MATERIALIZED rounds, all-integer after the cosine table
    "q_facility_select" -> FacilitySelectOracleSql,
    // interpolated Kneser–Ney bigram replay: D=3/4 makes every probability
    // a ratio of exact BIGINTs (num/den per the KneserNey scaladoc); ONE
    // double division + ln per position, floor-6 quantized BEFORE the
    // integer per-doc sum; avg via explicit floor so negative sums agree
    "q_kneser_ney" ->
      s"""WITH t AS (SELECT doc_id, $TokensSql AS toks FROM documents),
         |bp AS (
         |  SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
         |                 i -> toks[i] || ' ' || toks[i + 1])) AS b
         |  FROM t WHERE doc_id % 5 <> 0),
         |bi AS (SELECT b, CAST(count(*) AS BIGINT) AS cb FROM bp GROUP BY b),
         |hd AS (SELECT split_part(b, ' ', 1) AS w1,
         |              CAST(sum(cb) AS BIGINT) AS cw,
         |              CAST(count(*) AS BIGINT) AS nh
         |       FROM bi GROUP BY 1),
         |tl AS (SELECT split_part(b, ' ', 2) AS w2,
         |              CAST(count(*) AS BIGINT) AS nt
         |       FROM bi GROUP BY 1),
         |tt AS (SELECT CAST(count(*) AS BIGINT) AS t FROM bi),
         |pos AS (
         |  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
         |                 i -> toks[i] || ' ' || toks[i + 1])) AS b
         |  FROM t WHERE doc_id % 5 = 0),
         |sc AS (
         |  SELECT pos.doc_id,
         |         CASE WHEN hd.w1 IS NOT NULL
         |              THEN GREATEST(4 * coalesce(bi.cb, 0) - 3, 0) * tt.t
         |                   + 3 * hd.nh * GREATEST(coalesce(tl.nt, 0), 1)
         |              ELSE GREATEST(coalesce(tl.nt, 0), 1) END AS num,
         |         CASE WHEN hd.w1 IS NOT NULL THEN 4 * hd.cw * tt.t
         |              ELSE tt.t END AS den
         |  FROM pos LEFT JOIN bi USING (b)
         |  LEFT JOIN hd ON hd.w1 = split_part(pos.b, ' ', 1)
         |  LEFT JOIN tl ON tl.w2 = split_part(pos.b, ' ', 2)
         |  CROSS JOIN tt),
         |l6 AS (
         |  SELECT doc_id,
         |         CAST(floor(ln(CAST(num AS DOUBLE) / CAST(den AS DOUBLE))
         |                    * 1000000.0 + 0.5) AS BIGINT) AS l
         |  FROM sc)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |       CAST(sum(l) AS BIGINT) AS sum_logp_e6,
         |       CAST(floor(CAST(sum(l) AS DOUBLE) / count(*)) AS BIGINT)
         |         AS avg_logp_e6
         |FROM l6 GROUP BY doc_id""".stripMargin,
    // 1-Wasserstein drift on q_drift_by_type's exact bucket chain: the
    // per-bucket CDF gap assembled as the BIGINT |cum_g·n_rest −
    // cum_rest·n_g|, exact integer SUM, then ONE double expression
    // S / (n_g·n_rest) · (hi−lo) / 64 in the identical left-assoc order
    "q_wasserstein_drift" ->
      s"""WITH $DriftBucketCte,
        |e AS (SELECT f.g, f.b, f.n_g, pb.c_all, tot.n_all,
        |        CAST(sum(f.cnt) OVER (PARTITION BY f.g ORDER BY f.b)
        |             AS BIGINT) AS cum_g,
        |        CAST(sum(pb.c_all) OVER (PARTITION BY f.g ORDER BY f.b)
        |             AS BIGINT) AS cum_all
        |      FROM f JOIN pb USING (b), tot)
        |SELECT g AS event_type, max(n_g) AS n,
        |  round(CAST(sum(abs(cum_g * (n_all - n_g) - (cum_all - cum_g) * n_g))
        |             AS DOUBLE)
        |        / CAST(max(n_g * (n_all - n_g)) AS DOUBLE)
        |        * (hi - lo) / 64.0, 6) AS w1
        |FROM e, bounds WHERE n_all - n_g > 0 GROUP BY g, lo, hi""".stripMargin,
  )
}
