package graft.oracles

import graft.functions.Money

/** Shared DuckDB CTE bodies and fixture SQL reused across the
  * generated oracles and the SparkEntry.oracleSql map.
  *
  * Moved verbatim out of SparkEntry.scala (r18 split); the
  * `SparkEntry.oracleSql` map keeps every `"q..." ->` key and
  * references these by name.
  */
private[graft] object SharedCtes {

  // ------------------------------------------------------------------------
  // DuckDB oracle SQL (ANSI; runs over views named after the parquet tables)
  // ------------------------------------------------------------------------

  /** Flagship features as a reusable CTE body (DuckDB spelling). */
  private[graft] val FeaturesSql: String =
    """WITH ev AS (
      |  SELECT CAST(user_id AS VARCHAR) || '_' || strftime(ts, '%Y-%m-%d') AS user_session,
      |         event_type, ts, value AS price,
      |         regexp_extract(props, '"k": (\d+)', 1) AS product_id
      |  FROM events
      |), win AS (
      |  SELECT *, min(CASE WHEN event_type = 'purchase' THEN ts END)
      |         OVER (PARTITION BY user_session) AS purchase_ts FROM ev
      |), cut AS (
      |  SELECT * FROM win WHERE purchase_ts IS NULL OR ts <= purchase_ts
      |), features AS (
      |  SELECT user_session,
      |         max(CASE WHEN purchase_ts IS NOT NULL THEN 1 ELSE 0 END) AS label,
      |         count(CASE WHEN event_type = 'view' THEN 1 END) AS view_count,
      |         count(CASE WHEN event_type = 'click' THEN 1 END) AS cart_count,
      |         CAST(floor(epoch(max(ts))) AS BIGINT) - CAST(floor(epoch(min(ts))) AS BIGINT)
      |           AS session_duration,
      |         round(avg(price), 6) AS avg_price,
      |         max(price) AS max_price,
      |         count(DISTINCT product_id) AS unique_items
      |  FROM cut GROUP BY user_session
      |)""".stripMargin

  // \s+ split to mirror TextFunctions.tokens exactly — string_split on a
  // single space would silently diverge on tabs/newlines inside text
  /** One ANSI text, two engines: executed verbatim by `spark.sql` (the SQL
    * entry path over temp views) AND by DuckDB as its own oracle. Integer
    * aggregates only, so no float-summation-order caveats apply.
    */
  private[graft] val SqlParitySql: String =
    """SELECT c_mktsegment, count(*) AS n_orders,
      |       min(o_orderkey) AS min_orderkey, max(o_orderkey) AS max_orderkey
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment""".stripMargin

  /** DuckDB twin of `gapSessionBounds`: CTE chain ending in `sess(user_id,
    * session_idx, start_s, end_s)` — the same lag+cumsum spelling as the
    * q_gap_sessions oracle.
    */
  private[graft] val SessionBoundsCte: String =
    """WITH g AS (
      |  SELECT user_id, event_id, ts, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
      |         lag(CAST(floor(epoch(ts)) AS BIGINT), 1)
      |           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_s
      |  FROM events
      |), m AS (
      |  SELECT *, CASE WHEN prev_s IS NULL OR ts_s - prev_s > 1800 THEN 1 ELSE 0 END AS new_s
      |  FROM g
      |), sx AS (
      |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                             ROWS UNBOUNDED PRECEDING) AS session_idx
      |  FROM m
      |), sess AS (
      |  SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
      |         min(ts_s) AS start_s, max(ts_s) AS end_s
      |  FROM sx GROUP BY user_id, session_idx
      |)""".stripMargin

  /** Shared CTE for the WoE/IV oracles: QueryHelpers.woeBinnedUsers
    * respelled (activity-count bins vs the purchase label), per-bin
    * counts, and the defined-bin WoE (floor-6 over one ln) + IV term
    * (e6 BIGINT from the UNQUANTIZED ln, the operator's spelling).
    */
  private[graft] val WoeBinsCte: String =
    """WITH u AS (
      |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_ev,
      |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS pos
      |  FROM events GROUP BY 1),
      |bn AS (SELECT least(n_ev // 5, 10) AS bin, pos = 1 AS is_pos FROM u),
      |pb AS (
      |  SELECT bin,
      |         CAST(sum(CASE WHEN is_pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
      |         CAST(sum(CASE WHEN is_pos THEN 0 ELSE 1 END) AS BIGINT) AS n_neg
      |  FROM bn GROUP BY 1),
      |t AS (SELECT CAST(coalesce(sum(n_pos), 0) AS BIGINT) AS t_pos,
      |             CAST(coalesce(sum(n_neg), 0) AS BIGINT) AS t_neg FROM pb),
      |w AS (
      |  SELECT bin, n_pos, n_neg,
      |         CASE WHEN n_pos > 0 AND n_neg > 0 AND t_pos > 0 AND t_neg > 0
      |              THEN floor(ln((CAST(n_pos AS DOUBLE) / t_pos)
      |                            / (CAST(n_neg AS DOUBLE) / t_neg))
      |                         * 1000000.0 + 0.5) / 1000000.0 END AS woe,
      |         CAST(CASE WHEN n_pos > 0 AND n_neg > 0 AND t_pos > 0 AND t_neg > 0
      |              THEN floor(((CAST(n_pos AS DOUBLE) / t_pos)
      |                          - (CAST(n_neg AS DOUBLE) / t_neg))
      |                         * ln((CAST(n_pos AS DOUBLE) / t_pos)
      |                              / (CAST(n_neg AS DOUBLE) / t_neg))
      |                         * 1000000.0 + 0.5)
      |              ELSE 0 END AS BIGINT) AS iv_e6
      |  FROM pb CROSS JOIN t)""".stripMargin

  /** Shared CTE chain for the Fellegi–Sunter linkage oracles: the
    * dirty-twin synthesis (QueryHelpers.linkageSides respelled — every
    * double expression IEEE-identical), side-capped blocking join, the
    * two agreement predicates, literal milli weights, and the three-way
    * decision. Cents spelling floor(x*100+0.5) is pure IEEE (library
    * round() is not cross-engine-safe on arithmetic-derived doubles).
    */
  private[graft] val LinkageScoredCte: String =
    """WITH a0 AS (
      |  SELECT c_custkey AS a_id, c_name AS a_name, c_nationkey AS nationkey,
      |         c_mktsegment AS mktsegment, c_acctbal AS a_acctbal
      |  FROM customer),
      |b AS (
      |  SELECT c_custkey + 5000000 AS b_id, c_custkey AS truth_id,
      |         CASE WHEN c_custkey % 2 = 1 THEN c_name || 'x' ELSE c_name END AS b_name,
      |         c_nationkey AS nationkey,
      |         CASE WHEN c_custkey % 5 = 1 THEN 'OTHER' ELSE c_mktsegment END AS mktsegment,
      |         c_acctbal + CAST(c_custkey % 7 - 3 AS DOUBLE) * CAST(0.5 AS DOUBLE) AS b_acctbal
      |  FROM customer WHERE c_custkey % 3 = 0),
      |ac AS (
      |  SELECT a_id, a_name, nationkey, mktsegment, a_acctbal FROM (
      |    SELECT a0.*, count(*) OVER (PARTITION BY nationkey, mktsegment) AS bn FROM a0)
      |  WHERE bn <= 10000),
      |bc AS (
      |  SELECT b_id, truth_id, b_name, nationkey, mktsegment, b_acctbal FROM (
      |    SELECT b.*, count(*) OVER (PARTITION BY nationkey, mktsegment) AS bn FROM b)
      |  WHERE bn <= 10000),
      |p AS (
      |  SELECT a_id, b_id, truth_id, a_name,
      |         CAST(floor(a_acctbal * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
      |           AS a_cents,
      |         CAST(floor(b_acctbal * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
      |           AS b_cents,
      |         a_name = b_name AS agr_name,
      |         abs(CAST(floor(a_acctbal * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
      |           - CAST(floor(b_acctbal * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT))
      |           <= 100 AS agr_bal
      |  FROM ac JOIN bc USING (nationkey, mktsegment)),
      |sc AS (
      |  SELECT a_id, b_id, truth_id, a_name, a_cents, b_cents, agr_name, agr_bal,
      |         CAST((CASE WHEN agr_name THEN 2400 ELSE -1800 END)
      |            + (CASE WHEN agr_bal THEN 1200 ELSE -1000 END) AS BIGINT) AS score_milli,
      |         CASE WHEN (CASE WHEN agr_name THEN 2400 ELSE -1800 END)
      |                 + (CASE WHEN agr_bal THEN 1200 ELSE -1000 END) >= 3000 THEN 'match'
      |              WHEN (CASE WHEN agr_name THEN 2400 ELSE -1800 END)
      |                 + (CASE WHEN agr_bal THEN 1200 ELSE -1000 END) <= -1000 THEN 'nonmatch'
      |              ELSE 'review' END AS decision
      |  FROM p)""".stripMargin

  private[graft] val TokensSql =
    "list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), x -> len(x) > 0)"

  /** Fixed BM25 query workload (q_bm25_top_docs) — shared by the Spark
    * query and the generated DuckDB VALUES clause so they cannot drift.
    * "zzzmissing" is deliberately out-of-vocab (no posting → contributes
    * nothing; the "oov" query still ranks on its in-vocab term).
    */
  private[graft] val Bm25Queries: Seq[(String, String)] = Seq(
    ("perf", "spark"), ("perf", "slow"), ("perf", "join"),
    ("windowing", "window"), ("windowing", "sort"), ("windowing", "merge"),
    ("storage", "table"), ("storage", "scan"), ("storage", "column"),
    ("oov", "zzzmissing"), ("oov", "stream"))

  private[graft] val Bm25ValuesSql: String =
    Bm25Queries.map { case (q, t) => s"('$q', '$t')" }.mkString(", ")

  /** Generated DuckDB replay of Pca.topComponent (d = 8, 5 iterations):
    * round-6 moment sums, covariance from rounded stats, the power
    * iteration unrolled CTE-per-round with ascending-index left-assoc
    * sums — term-for-term the arithmetic Pca.powerIteration performs.
    */
  /** Shared generated CTE prefix (`st` → `c`): round-6 moment sums over
    * the first D embedding dims and the covariance matrix derived from
    * them — the common head of the PCA and correlation oracles.
    */
  private[graft] def momentCovCte(D: Int): String = {
    def el(i: Int) = s"CAST(embedding[${i + 1}] AS DOUBLE)"
    val dims = 0 until D
    val sCols = dims.map(i => s"round(sum(${el(i)}), 6) AS s$i")
    val qCols = for { i <- dims; j <- dims }
      yield s"round(sum(${el(i)} * ${el(j)}), 6) AS q${i}_$j"
    val covCols = for { i <- dims; j <- dims }
      yield s"q${i}_$j / n - (s$i / n) * (s$j / n) AS c${i}_$j"
    s"""WITH st AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS n,
       |         ${(sCols ++ qCols).mkString(",\n         ")}
       |  FROM embeddings
       |  WHERE embedding IS NOT NULL AND len(embedding) >= $D
       |), c AS (
       |  SELECT n, ${covCols.mkString(",\n         ")}
       |  FROM st
       |)""".stripMargin
  }

  /** Unrolled power-iteration CTE block over matrix columns `$mat{i}_{j}`
    * (available from CTE `$src`): emits `${v}it0 … ${v}it$iters` carrying
    * all upstream columns; final unit-vector columns are `${v}${iters}_i`.
    * Same arithmetic as [[graft.operators.Pca.powerIteration]]: uniform
    * start, ascending-index left-assoc matvec and norm sums.
    */
  private[graft] def powerIterCtes(D: Int, iters: Int, mat: String, v: String, src: String): String = {
    val dims = 0 until D
    val v0 = dims.map(i =>
      s"CAST(1.0 AS DOUBLE) / sqrt(CAST($D.0 AS DOUBLE)) AS ${v}0_$i")
    val iterCtes = (1 to iters).flatMap { t =>
      val mv = dims.map(i =>
        dims.map(j => s"$mat${i}_$j * ${v}${t - 1}_$j").mkString(" + ") +
          s" AS ${v}w${t}_$i")
      val nrm = "sqrt(" +
        dims.map(i => s"${v}w${t}_$i * ${v}w${t}_$i").mkString(" + ") +
        s") AS ${v}nrm$t"
      Seq(
        s"${v}cw$t AS (SELECT *, ${mv.mkString(", ")} FROM ${v}it${t - 1})",
        s"${v}cn$t AS (SELECT *, $nrm FROM ${v}cw$t)",
        s"${v}it$t AS (SELECT *, ${dims.map(i => s"${v}w${t}_$i / ${v}nrm$t AS ${v}${t}_$i").mkString(", ")} FROM ${v}cn$t)")
    }
    (s"${v}it0 AS (SELECT *, ${v0.mkString(", ")} FROM $src)" +: iterCtes)
      .mkString(",\n")
  }

  /** Shared CTE chain for the near-dup component oracles (q_dedup_components
    * / q_dedup_keep / q_dedup_keep_best): shingle edges (hot-shingle cap 20,
    * ≥ 5 shared) → recursive min-label reachability → `comp(node,
    * component)`. Mirrors `shingleEdges` + `Components.connectedComponents`.
    */
  /** Shingle-edge construction through the bidirectional edge list `bi` —
    * the common prefix of the component oracles and q_pagerank.
    */
  private[graft] lazy val EdgesCte: String =
    s"""WITH RECURSIVE t AS (
       |  SELECT doc_id, $TokensSql AS toks FROM documents
       |), d AS (
       |  SELECT doc_id, list_distinct(
       |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
       |         ELSE list_transform(generate_series(1, len(toks) - 2),
       |                             i -> array_to_string(toks[i:i+2], ' '))
       |    END) AS sh
       |  FROM t),
       |ex AS (SELECT doc_id, unnest(sh) AS s FROM d),
       |hot AS (SELECT s FROM ex GROUP BY s HAVING count(*) > 20),
       |exf AS (SELECT doc_id, s FROM ex WHERE s NOT IN (SELECT s FROM hot)),
       |e AS (SELECT a.doc_id AS src, b.doc_id AS dst,
       |             CAST(count(*) AS BIGINT) AS n_shared
       |      FROM exf a JOIN exf b ON a.s = b.s AND b.doc_id > a.doc_id
       |      GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 5),
       |bi AS (SELECT src AS a, dst AS b FROM e UNION SELECT dst AS a, src AS b FROM e)""".stripMargin

  private[graft] lazy val DedupCompCte: String =
    s"""$EdgesCte,
       |reach(node, r) AS (
       |  SELECT a, a FROM bi
       |  UNION
       |  SELECT reach.node, bi.b FROM reach JOIN bi ON bi.a = reach.r
       |),
       |comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node)""".stripMargin

  /** Shared 64-bucket drift histogram chain over events.value — bucket
    * ids from the pinned IEEE `(v-lo)/(hi-lo)*64` spelling, dense
    * (group × bucket) spine, per-bucket/global totals. ONE text consumed
    * by q_drift_by_type, q_wasserstein_drift, and the Sinkhorn replay so
    * the bucketing can never drift between the drift-family oracles
    * (mirrors `Drift.bucketedCdf`).
    */
  private[graft] lazy val DriftBucketCte: String =
    """r AS (SELECT event_type AS g, value AS v FROM events
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
      |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_all FROM c)""".stripMargin

  private[graft] val StopSql =
    "['the','a','of','and','to','in','is','it','that','for']"

  /** The event-type alphabet the Markov stationary query fixes as its
    * contract — ONE list feeds the Spark workload and the generated
    * oracle (the Bm25Queries single-source discipline).
    */
  private[graft] val MarkovStatesList = Seq("click", "error", "purchase", "signup", "view")

  /** Shared k-means replay CTE chain (pts/seeds/rounds up to the final
    * assignment CTE a3) — consumed by both the cluster-stats oracle and
    * the ARI/purity oracle so the replayed trajectory cannot drift.
    */
  private[graft] lazy val KMeansCtes: String = kmeansCtesFrom("embeddings", 8)

  /** The k-means replay chain parameterized by the source relation and k
    * (rounds fixed at 3) — `KMeansCtes` is the `("embeddings", 8)`
    * instance (byte-identical to its pre-refactor text), and the SemDeDup
    * replay trains over a planted-union subset.
    */
  private[graft] def kmeansCtesFrom(src: String, K: Int): String = {
    val D = 64; val R = 3
    val dims = 0 until D
    val ptCols = dims.map(i =>
      s"CAST(floor(CAST(embedding[${i + 1}] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS x$i")
    val distExpr =
      dims.map(i => s"(p.x$i - c.x$i) * (p.x$i - c.x$i)").mkString(" + ")
    val centerCols = dims.map(i =>
      s"CAST(floor(CAST(sum(p.x$i) AS DOUBLE) / CAST(count(*) AS DOUBLE) + 0.5) AS BIGINT) AS x$i")
    val roundCtes = (0 to R).map { r =>
      val assignCte =
        s"d$r AS (SELECT p.vec_id, c.cid, $distExpr AS dist\n" +
          s"  FROM pts p CROSS JOIN c$r c),\n" +
          s"a$r AS (SELECT vec_id, cid, dist FROM d$r\n" +
          s"  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1)"
      if (r == R) assignCte
      else assignCte + ",\n" +
        s"c${r + 1} AS (SELECT a.cid AS cid, ${centerCols.mkString(", ")}\n" +
        s"  FROM a$r a JOIN pts p USING (vec_id) GROUP BY a.cid)"
    }
    s"""WITH pts AS (
       |  SELECT vec_id, ${ptCols.mkString(",\n         ")}
       |  FROM $src WHERE embedding IS NOT NULL AND len(embedding) >= $D
       |), sd AS (
       |  SELECT vec_id,
       |         row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cid
       |  FROM pts
       |), c0 AS (
       |  SELECT sd.cid AS cid, ${dims.map(i => s"p.x$i").mkString(", ")}
       |  FROM sd JOIN pts p USING (vec_id) WHERE sd.cid < $K
       |),
       |${roundCtes.mkString(",\n")}""".stripMargin
  }

  /** DuckDB twin of [[plantedLineDocs]] + LineDedup's line/frequency CTEs
    * (zipped parallel unnest = posexplode; trim-md5 line keys; DISTINCT
    * doc counts) — shared by the q_line_stats and q_line_dedup oracles.
    */
  private[graft] val PlantedLinesCte: String =
    """WITH planted AS (
      |  SELECT doc_id,
      |         concat_ws(chr(10), text,
      |                   CASE WHEN doc_id % 3 = 0 THEN 'subscribe to our newsletter' END,
      |                   CASE WHEN doc_id % 5 = 0 THEN 'all rights reserved' END,
      |                   CASE WHEN doc_id % 7 = 0 THEN text END) AS text
      |  FROM documents
      |), lns AS (
      |  SELECT doc_id,
      |         unnest(range(1, len(string_split(text, chr(10))) + 1)) AS idx,
      |         unnest(string_split(text, chr(10))) AS line
      |  FROM planted
      |), norm AS (
      |  SELECT doc_id, idx, line, md5(trim(line)) AS h, trim(line) AS t FROM lns
      |), freq AS (
      |  SELECT h, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
      |  FROM norm WHERE t <> '' GROUP BY h HAVING count(DISTINCT doc_id) >= 10
      |)""".stripMargin

  /** DuckDB twin of [[syntheticUrls]] + UrlFunctions.canonicalize — the
    * identical literal-split pipeline (split_part ≡ substring_index for
    * single-occurrence separators, list_filter/list_sort ≡ the HOF
    * filter/array_sort), ending in `t(c_custkey, url, canon)`.
    */
  private[graft] val SyntheticUrlsCte: String =
    """WITH u AS (
      |  SELECT c_custkey,
      |         'HTTPS://WWW.Shop' || CAST(c_custkey % 7 AS VARCHAR) ||
      |         '.Example.COM/Seg/' || c_mktsegment ||
      |         CASE WHEN c_custkey % 3 = 0 THEN '/' ELSE '' END ||
      |         '?utm_source=mail&utm_campaign=x&id=' || CAST(c_custkey % 50 AS VARCHAR) ||
      |         CASE WHEN c_custkey % 2 = 0 THEN '&fbclid=abc' ELSE '' END ||
      |         CASE WHEN c_custkey % 4 = 0 THEN '&b=2&a=1' ELSE '' END ||
      |         '#section' || CAST(c_custkey % 5 AS VARCHAR) AS url
      |  FROM customer
      |), q AS (
      |  SELECT c_custkey, url,
      |         split_part(split_part(url, '#', 1), '?', 1) AS base,
      |         CASE WHEN position('?' IN split_part(url, '#', 1)) > 0
      |              THEN split_part(split_part(url, '#', 1), '?', 2) ELSE '' END AS qs
      |  FROM u
      |), s AS (
      |  SELECT c_custkey, url, qs,
      |         split_part(base, '://', 1) AS scheme,
      |         split_part(split_part(base, '://', 2), '/', 1) AS host,
      |         substr(split_part(base, '://', 2),
      |                len(split_part(split_part(base, '://', 2), '/', 1)) + 1,
      |                1048576) AS path
      |  FROM q
      |), t AS (
      |  SELECT c_custkey, url,
      |         lower(scheme) || '://' || lower(host) || rtrim(path, '/') ||
      |         CASE WHEN kept <> '' THEN '?' || kept ELSE '' END AS canon
      |  FROM (SELECT *, array_to_string(list_sort(list_filter(string_split(qs, '&'),
      |          x -> x <> '' AND NOT starts_with(x, 'utm_')
      |               AND NOT starts_with(x, 'fbclid=')
      |               AND NOT starts_with(x, 'gclid=')
      |               AND NOT starts_with(x, 'ref='))), '&') AS kept
      |        FROM s)
      |)""".stripMargin

  /** SQL twin of [[syntheticHtml]] — the identical concat expression. */
  private[graft] val SyntheticHtmlSql: String =
    "'<html><head><title>Doc</title><style>p{color:red}</style></head>" +
      "<body><h1>Heading &amp; more</h1><p>' || text || " +
      "'</p><a href=\"https://Example.com/p/' || CAST(doc_id % 5 AS VARCHAR) || " +
      "'?utm_source=x&b=2&a=1#f\">L1</a> <a href=\"http://Host' || CAST(doc_id % 3 AS VARCHAR) || " +
      "'.org/x/\">L2</a><script>var s=1;</script></body></html>'"

  /** Shared winnowing replay chain (ends in `fp(doc_id, fp_hash, fp_pos)`):
    * MOSS normalization, md5-32 k-gram hashes (k=5), hash and position
    * packed into one BIGINT (h·2²⁴ + (2²⁴−1−pos)) so the w=8 sliding-window
    * "min hash, rightmost on ties" selection is a single windowed MIN —
    * mirrors [[graft.operators.Winnow.fingerprints]] step for step.
    */
  private[graft] def winnowCtes(src: String): String =
    s"""WITH w0 AS MATERIALIZED (
       |  SELECT doc_id, regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS s
       |  FROM ($src)),
       |wh AS (
       |  SELECT doc_id, pos,
       |         ('0x' || substring(md5(substring(s, CAST(pos AS INT), 5)), 1, 8))::BIGINT AS h
       |  FROM (SELECT doc_id, s, unnest(range(1, length(s) - 3)) AS pos
       |        FROM w0 WHERE length(s) >= 5)),
       |wk AS (
       |  SELECT doc_id, pos,
       |         min(h * 16777216 + (16777215 - pos)) OVER (
       |           PARTITION BY doc_id ORDER BY pos
       |           ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS fpkey
       |  FROM wh),
       |fp AS (
       |  SELECT DISTINCT doc_id, fpkey // 16777216 AS fp_hash,
       |                  16777215 - (fpkey % 16777216) AS fp_pos
       |  FROM wk WHERE pos >= 8)""".stripMargin

  /** Shared dHash byte-fold replay chain (ends in `bands(doc_id, media_type,
    * band_idx, band_val)` with `bits(doc_id, j, bit)` available upstream):
    * per-byte values reconstructed from the hex dump's nibble pairs
    * (strpos arithmetic — DuckDB hex() is uppercase), positional fold into
    * the 72-cell grid (cell = byte index mod 72, exact integer sums,
    * COALESCE-densified so short docs still emit all cells), strict->
    * horizontal difference bits over the 8×9 grid, 16-bit band packing.
    * Mirrors [[graft.operators.Multimodal.dHashStubBands]] step for step.
    */
  private[graft] def phashCtes(src: String): String =
    s"""WITH pxsrc AS MATERIALIZED (
       |  SELECT doc_id, media_type, regexp_extract_all(hex(encode(text)), '..') AS px
       |  FROM ($src)),
       |pv AS (
       |  SELECT doc_id, unnest(range(0, len(px))) AS i, unnest(px) AS hx FROM pxsrc),
       |gs AS (
       |  SELECT doc_id, CAST(i % 72 AS INT) AS cell,
       |         sum((strpos('0123456789ABCDEF', hx[1:1]) - 1) * 16
       |             + (strpos('0123456789ABCDEF', hx[2:2]) - 1)) AS s
       |  FROM pv GROUP BY 1, 2),
       |grid AS (
       |  SELECT d.doc_id, d.media_type, c.cell, COALESCE(gs.s, 0) AS s
       |  FROM pxsrc d
       |  CROSS JOIN (SELECT CAST(unnest(range(0, 72)) AS INT) AS cell) c
       |  LEFT JOIN gs ON gs.doc_id = d.doc_id AND gs.cell = c.cell),
       |bits AS (
       |  SELECT l.doc_id, l.media_type, (l.cell // 9) * 8 + (l.cell % 9) AS j,
       |         CASE WHEN l.s > r.s THEN 1 ELSE 0 END AS bit
       |  FROM grid l JOIN grid r ON r.doc_id = l.doc_id AND r.cell = l.cell + 1
       |  WHERE l.cell % 9 < 8),
       |bands AS (
       |  SELECT doc_id, media_type, CAST(j // 16 AS INT) AS band_idx,
       |         CAST(sum(bit * (1 << CAST(j % 16 AS INT))) AS INT) AS band_val
       |  FROM bits GROUP BY 1, 2, 3)""".stripMargin
}
