package graft.oracles

import graft.functions.Money
import graft.oracles.SharedCtes._

/** Generated DuckDB oracle replays: statistics / causal / survival /
  * privacy-mechanism / ML-replay family.
  *
  * Moved verbatim out of SparkEntry.scala (r18 split); the
  * `SparkEntry.oracleSql` map keeps every `"q..." ->` key and
  * references these by name.
  */
private[graft] object StatsOracles {

  /** Generated replay of Bootstrap.poissonMeanCi over documents.n_chars
    * (B = 200): the Poisson(1) CDF thresholds splice verbatim from the
    * Scala values (Double.toString round-trips — the GmmOracle constant
    * precedent), u is the exact md5-48 dyadic rational, replicate means
    * are single divisions of exact sums, and the CI bounds are the fixed
    * rank-5/rank-195 order statistics.
    */
  private[graft] lazy val BootstrapOracleSql: String = {
    val B = 200
    val loRank = math.max(1, math.floor(B * 0.025d).toInt)
    val hiRank = math.min(B, math.ceil(B * 0.975d).toInt)
    val wExpr = graft.operators.Bootstrap.PoissonCdf
      .map(c => s"(CASE WHEN u >= $c THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH base AS (SELECT doc_id AS id, CAST(n_chars AS BIGINT) AS x FROM documents),
       |pt AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
       |         CAST(floor(CAST(sum(x) AS DOUBLE) * 1000000.0
       |              / CAST(count(*) AS DOUBLE) + 0.5) AS BIGINT) AS mean_e6
       |       FROM base),
       |rep AS (SELECT id, x, unnest(range(0, $B)) AS b FROM base),
       |uw AS (SELECT b, x,
       |         CAST(('0x' || substring(md5(CAST(id AS VARCHAR) || ':' || b), 1, 12))::BIGINT
       |              AS DOUBLE) / ${graft.operators.Bootstrap.TwoPow48} AS u
       |       FROM rep),
       |ww AS (SELECT b, x, CAST($wExpr AS BIGINT) AS w FROM uw),
       |rm AS (SELECT b,
       |         CAST(floor(CAST(sum(w * x) AS DOUBLE) * 1000000.0
       |              / CAST(sum(w) AS DOUBLE) + 0.5) AS BIGINT) AS m
       |       FROM ww GROUP BY b HAVING sum(w) > 0),
       |rk AS (SELECT m, b, row_number() OVER (ORDER BY m, b) AS rn FROM rm),
       |lo AS (SELECT m AS lo_e6 FROM rk WHERE rn = $loRank),
       |hi AS (SELECT m AS hi_e6 FROM rk WHERE rn = $hiRank)
       |SELECT pt.n_rows, CAST($B AS INT) AS b_reps, pt.mean_e6, lo.lo_e6, hi.hi_e6
       |FROM pt CROSS JOIN lo CROSS JOIN hi""".stripMargin
  }

  /** KS replay: distinct-value per-arm counts, windowed cumulative counts
    * (CAST AS BIGINT per the HUGEINT gotcha), the exact integer max of
    * |c0·n1 − c1·n0|, one floor division.
    */
  private[graft] lazy val KsOracleSql: String =
    s"""WITH e AS (
       |  SELECT CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS x,
       |         ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT % 2 AS a
       |  FROM events WHERE value IS NOT NULL),
       |g AS (SELECT x,
       |        CAST(sum(CASE WHEN a = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a0,
       |        CAST(sum(CASE WHEN a = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a1
       |      FROM e GROUP BY x),
       |c AS (SELECT x,
       |        CAST(sum(a0) OVER (ORDER BY x
       |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c0,
       |        CAST(sum(a1) OVER (ORDER BY x
       |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c1
       |      FROM g),
       |t AS (SELECT CAST(sum(CASE WHEN a = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
       |             CAST(sum(CASE WHEN a = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
       |      FROM e),
       |m AS (SELECT t.n0, t.n1, CAST(max(abs(c.c0 * t.n1 - c.c1 * t.n0)) AS BIGINT) AS d_num
       |      FROM c CROSS JOIN t GROUP BY t.n0, t.n1)
       |SELECT n0, n1, d_num, d_num * 1000000 // (n0 * n1) AS d_e6 FROM m""".stripMargin

  /** χ²/Cramér's V replay: full r×c grid with zero-filled cells, the
    * (o·N − rs·cs)²/(N·rs·cs) spelling — exact BIGINT root, identical
    * double squaring/division, e6 per-cell quantization before the exact
    * sum, one replayed sqrt.
    */
  private[graft] lazy val Chi2OracleSql: String =
    s"""WITH rs AS (SELECT source AS r, CAST(count(*) AS BIGINT) AS rsum
       |            FROM documents GROUP BY source),
       |cs AS (SELECT lang AS c, CAST(count(*) AS BIGINT) AS csum
       |       FROM documents GROUP BY lang),
       |ce AS (SELECT source AS r, lang AS c, CAST(count(*) AS BIGINT) AS o
       |       FROM documents GROUP BY source, lang),
       |tt AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM documents),
       |grid AS (
       |  SELECT rs.r, cs.c, rs.rsum, cs.csum, tt.nn, coalesce(ce.o, 0) AS o
       |  FROM rs CROSS JOIN cs
       |  LEFT JOIN ce ON ce.r = rs.r AND ce.c = cs.c
       |  CROSS JOIN tt),
       |tm AS (
       |  SELECT nn, r, c,
       |         CAST(floor(
       |           CAST(o * nn - rsum * csum AS DOUBLE)
       |           * CAST(o * nn - rsum * csum AS DOUBLE)
       |           / (CAST(nn AS DOUBLE) * CAST(rsum AS DOUBLE) * CAST(csum AS DOUBLE))
       |           * 1000000.0 + 0.5) AS BIGINT) AS term_e6
       |  FROM grid),
       |ag AS (
       |  SELECT nn, CAST(count(DISTINCT r) AS BIGINT) AS n_rows_dim,
       |         CAST(count(DISTINCT c) AS BIGINT) AS n_cols_dim,
       |         CAST(sum(term_e6) AS BIGINT) AS chi2_e6
       |  FROM tm GROUP BY nn)
       |SELECT nn AS n, n_rows_dim, n_cols_dim, chi2_e6,
       |  CASE WHEN least(n_rows_dim - 1, n_cols_dim - 1) = 0 THEN CAST(0 AS BIGINT)
       |       ELSE CAST(floor(sqrt((CAST(chi2_e6 AS DOUBLE) / 1000000.0)
       |              / CAST(nn * least(n_rows_dim - 1, n_cols_dim - 1) AS DOUBLE))
       |              * 1000000.0 + 0.5) AS BIGINT) END AS cramers_v_e6
       |FROM ag""".stripMargin

  /** BH replay: exact BIGINT moments, the identical Welch/Zelen-Severo
    * double spelling (Horner poly, spelled 1/sqrt(2pi) literal), e6
    * quantization before any comparison, integer step-up.
    */
  private[graft] lazy val FdrBhOracleSql: String =
    s"""WITH base AS (SELECT source AS g, CAST(n_chars AS BIGINT) AS y FROM documents),
       |per AS (SELECT g, CAST(count(*) AS BIGINT) AS n1, CAST(sum(y) AS BIGINT) AS s1,
       |               CAST(sum(y * y) AS BIGINT) AS ss1 FROM base GROUP BY g),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS nn, CAST(sum(y) AS BIGINT) AS ss,
       |               CAST(sum(y * y) AS BIGINT) AS sss FROM base),
       |j AS (SELECT per.g, per.n1, per.s1, per.ss1,
       |             tot.nn - per.n1 AS n2, tot.ss - per.s1 AS s2,
       |             tot.sss - per.ss1 AS ss2
       |      FROM per CROSS JOIN tot
       |      WHERE per.n1 >= 2 AND tot.nn - per.n1 >= 2),
       |mm AS (SELECT g, n1, n2, ss1, ss2,
       |              CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
       |              CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS m2
       |       FROM j),
       |vv AS (SELECT g, n1, n2, m1, m2,
       |         (CAST(ss1 AS DOUBLE) - CAST(n1 AS DOUBLE) * m1 * m1)
       |           / CAST(n1 - 1 AS DOUBLE) AS v1,
       |         (CAST(ss2 AS DOUBLE) - CAST(n2 AS DOUBLE) * m2 * m2)
       |           / CAST(n2 - 1 AS DOUBLE) AS v2
       |       FROM mm),
       |zz AS (SELECT g, n1,
       |         sqrt(v1 / CAST(n1 AS DOUBLE) + v2 / CAST(n2 AS DOUBLE)) AS se,
       |         abs(m1 - m2)
       |           / sqrt(v1 / CAST(n1 AS DOUBLE) + v2 / CAST(n2 AS DOUBLE)) AS z
       |       FROM vv),
       |tq AS (SELECT g, n1, z, 1.0 / (1.0 + 0.2316419 * z) AS t
       |       FROM zz WHERE se > 0.0),
       |pp AS (SELECT g, n1 AS n_rows,
       |         CAST(floor(z * 1000000.0 + 0.5) AS BIGINT) AS z_e6,
       |         CAST(floor(2.0 * (exp(-0.5 * z * z) * 0.3989422804014327
       |           * (((((1.330274429 * t - 1.821255978) * t + 1.781477937) * t
       |                - 0.356563782) * t + 0.319381530) * t))
       |           * 1000000.0 + 0.5) AS BIGINT) AS p_e6
       |       FROM tq),
       |rkd AS (SELECT g, n_rows, z_e6, p_e6,
       |               CAST(row_number() OVER (ORDER BY p_e6, g) AS BIGINT) AS rk,
       |               CAST(count(*) OVER () AS BIGINT) AS m_tests
       |        FROM pp),
       |ks AS (SELECT CAST(max(CASE WHEN p_e6 * m_tests <= 50000 * rk
       |                            THEN rk ELSE 0 END) AS BIGINT) AS kstar
       |       FROM rkd)
       |SELECT g AS source, n_rows, z_e6, p_e6, rk, m_tests,
       |       rk <= ks.kstar AS rejected
       |FROM rkd CROSS JOIN ks""".stripMargin

  /** Conformal replay: same md5-48 quarter split, integer-DIV mean model,
    * score-count cumulative ranks (CAST every windowed sum — HUGEINT ban),
    * exact ceil-rank via integer arithmetic, -1 infinite-interval sentinel.
    */
  private[graft] lazy val ConformalOracleSql: String =
    s"""WITH base AS (
       |  SELECT source AS g, CAST(n_chars AS BIGINT) AS y,
       |         ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT % 4 AS b
       |  FROM documents),
       |model AS (
       |  SELECT g, CAST(sum(y) AS BIGINT) * 1000000 // CAST(count(*) AS BIGINT)
       |           AS yhat_micros
       |  FROM base WHERE b <= 1 GROUP BY g),
       |cal AS (
       |  SELECT base.g, abs(base.y * 1000000 - model.yhat_micros) AS s
       |  FROM base JOIN model ON model.g = base.g WHERE base.b = 2),
       |rk AS (
       |  SELECT g, CAST(count(*) AS BIGINT) AS n_cal,
       |         (9 * (CAST(count(*) AS BIGINT) + 1) + 9) // 10 AS r
       |  FROM cal GROUP BY g),
       |cum AS (
       |  SELECT g, s, CAST(sum(c) OVER (PARTITION BY g ORDER BY s
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM (SELECT g, s, CAST(count(*) AS BIGINT) AS c FROM cal GROUP BY g, s)),
       |qh AS (
       |  SELECT cum.g, CAST(min(cum.s) AS BIGINT) AS qhat_micros
       |  FROM cum JOIN rk ON rk.g = cum.g WHERE cum.cum >= rk.r GROUP BY cum.g),
       |tst AS (
       |  SELECT base.g, rk.n_cal, qh.qhat_micros,
       |         CASE WHEN qh.qhat_micros IS NULL
       |                OR abs(base.y * 1000000 - model.yhat_micros) <= qh.qhat_micros
       |           THEN 1 ELSE 0 END AS cov
       |  FROM base JOIN model ON model.g = base.g
       |  JOIN rk ON rk.g = base.g
       |  LEFT JOIN qh ON qh.g = base.g
       |  WHERE base.b = 3)
       |SELECT g AS source, n_cal, CAST(count(*) AS BIGINT) AS n_test,
       |       coalesce(min(qhat_micros), -1) AS qhat_micros,
       |       CAST(sum(cov) AS BIGINT) AS covered,
       |       CAST(floor(CAST(sum(cov) AS DOUBLE) * 1000000.0
       |            / CAST(count(*) AS DOUBLE)) AS BIGINT) AS coverage_e6
       |FROM tst GROUP BY g, n_cal""".stripMargin

  /** Causal replay: exact contingency BIGINTs per stratum, ONE fixed-
    * spelling double contrast per stratum e6-quantized before the integer
    * sums, final divisions as identically-spelled floor(x+0.5) round-half-
    * up doubles (totals may be negative — never a bare DIV there).
    */
  private[graft] lazy val CausalOracleSql: String =
    s"""$FeaturesSql,
       |base AS (SELECT CASE WHEN cart_count >= 1 THEN 1 ELSE 0 END AS t,
       |                label AS y, least(view_count, 8) AS s
       |         FROM features),
       |st AS (SELECT s, CAST(count(*) AS BIGINT) AS n, CAST(sum(t) AS BIGINT) AS n1,
       |              CAST(sum(t * y) AS BIGINT) AS pos1,
       |              CAST(sum((1 - t) * y) AS BIGINT) AS pos0
       |       FROM base GROUP BY s),
       |st2 AS (SELECT *, n - n1 AS n0 FROM st),
       |tm AS (SELECT n, n1, pos1, pos0,
       |         CASE WHEN n1 > 0 AND n0 > 0 THEN CAST(floor(
       |           (CAST(pos1 AS DOUBLE) / CAST(n1 AS DOUBLE)
       |            - CAST(pos0 AS DOUBLE) / CAST(n0 AS DOUBLE))
       |           * CAST(n AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
       |           ELSE CAST(0 AS BIGINT) END AS ate_t,
       |         CASE WHEN n1 > 0 AND n0 > 0 THEN CAST(floor(
       |           (CAST(pos1 AS DOUBLE) / CAST(n1 AS DOUBLE)
       |            - CAST(pos0 AS DOUBLE) / CAST(n0 AS DOUBLE))
       |           * CAST(n1 AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
       |           ELSE CAST(0 AS BIGINT) END AS att_t
       |       FROM st2),
       |ag AS (SELECT CAST(sum(n) AS BIGINT) AS n, CAST(sum(n1) AS BIGINT) AS n_treated,
       |              CAST(sum(pos1) AS BIGINT) AS pos1t, CAST(sum(pos0) AS BIGINT) AS pos0t,
       |              CAST(sum(ate_t) AS BIGINT) AS ate_num,
       |              CAST(sum(att_t) AS BIGINT) AS att_num
       |       FROM tm)
       |SELECT n, n_treated,
       |  pos1t * 1000000 // n_treated - pos0t * 1000000 // (n - n_treated) AS naive_e6,
       |  CAST(floor(CAST(ate_num AS DOUBLE) / CAST(n AS DOUBLE) + 0.5) AS BIGINT) AS ate_e6,
       |  CAST(floor(CAST(att_num AS DOUBLE) / CAST(n_treated AS DOUBLE) + 0.5) AS BIGINT)
       |    AS att_e6
       |FROM ag""".stripMargin

  /** Stratified-ATE bootstrap replay: the CausalOracleSql point chain, the
    * BootstrapOracleSql Poisson weight chain keyed by user_session:b, the
    * per-(replicate, stratum) weighted contingency BIGINTs through the
    * identical e6-per-stratum / floor(x+0.5) ATE spelling, CI bounds as
    * fixed-rank order statistics over the B replicate ATEs.
    */
  private[graft] lazy val AteBootstrapOracleSql: String = {
    val B = 100
    val loRank = math.max(1, math.floor(B * 0.025d).toInt)
    val hiRank = math.min(B, math.ceil(B * 0.975d).toInt)
    val wExpr = graft.operators.Bootstrap.PoissonCdf
      .map(c => s"(CASE WHEN u >= $c THEN 1 ELSE 0 END)").mkString(" + ")
    s"""$FeaturesSql,
       |base AS (SELECT user_session AS id,
       |                CASE WHEN cart_count >= 1 THEN 1 ELSE 0 END AS t,
       |                label AS y, least(view_count, 8) AS s
       |         FROM features),
       |st AS (SELECT s, CAST(count(*) AS BIGINT) AS n, CAST(sum(t) AS BIGINT) AS n1,
       |              CAST(sum(t * y) AS BIGINT) AS pos1,
       |              CAST(sum((1 - t) * y) AS BIGINT) AS pos0
       |       FROM base GROUP BY s),
       |st2 AS (SELECT *, n - n1 AS n0 FROM st),
       |tm AS (SELECT n, n1,
       |         CASE WHEN n1 > 0 AND n0 > 0 THEN CAST(floor(
       |           (CAST(pos1 AS DOUBLE) / CAST(n1 AS DOUBLE)
       |            - CAST(pos0 AS DOUBLE) / CAST(n0 AS DOUBLE))
       |           * CAST(n AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
       |           ELSE CAST(0 AS BIGINT) END AS ate_t
       |       FROM st2),
       |pt AS (SELECT CAST(sum(n) AS BIGINT) AS n, CAST(sum(n1) AS BIGINT) AS n_treated,
       |              CAST(floor(CAST(sum(ate_t) AS DOUBLE) / CAST(sum(n) AS DOUBLE)
       |                   + 0.5) AS BIGINT) AS ate_e6
       |       FROM tm),
       |rep AS (SELECT id, t, y, s, unnest(range(0, $B)) AS b FROM base),
       |uw AS (SELECT b, t, y, s,
       |         CAST(('0x' || substring(md5(CAST(id AS VARCHAR) || ':' || b), 1, 12))::BIGINT
       |              AS DOUBLE) / ${graft.operators.Bootstrap.TwoPow48} AS u
       |       FROM rep),
       |ww AS (SELECT b, t, y, s, CAST($wExpr AS BIGINT) AS w FROM uw),
       |rs AS (SELECT b, s, CAST(sum(w) AS BIGINT) AS nw,
       |              CAST(sum(w * t) AS BIGINT) AS n1w,
       |              CAST(sum(w * t * y) AS BIGINT) AS pos1w,
       |              CAST(sum(w * (1 - t) * y) AS BIGINT) AS pos0w
       |       FROM ww GROUP BY b, s),
       |rs2 AS (SELECT *, nw - n1w AS n0w FROM rs),
       |rtm AS (SELECT b, nw,
       |          CASE WHEN n1w > 0 AND n0w > 0 THEN CAST(floor(
       |            (CAST(pos1w AS DOUBLE) / CAST(n1w AS DOUBLE)
       |             - CAST(pos0w AS DOUBLE) / CAST(n0w AS DOUBLE))
       |            * CAST(nw AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
       |            ELSE CAST(0 AS BIGINT) END AS ate_t
       |        FROM rs2),
       |rm AS (SELECT b, CAST(floor(CAST(sum(ate_t) AS DOUBLE)
       |              / CAST(sum(nw) AS DOUBLE) + 0.5) AS BIGINT) AS m
       |       FROM rtm GROUP BY b HAVING sum(nw) > 0),
       |rk AS (SELECT m, b, row_number() OVER (ORDER BY m, b) AS rn FROM rm),
       |lo AS (SELECT m AS lo_e6 FROM rk WHERE rn = $loRank),
       |hi AS (SELECT m AS hi_e6 FROM rk WHERE rn = $hiRank)
       |SELECT pt.n, pt.n_treated, pt.ate_e6, CAST($B AS INT) AS b_reps,
       |       lo.lo_e6, hi.hi_e6
       |FROM pt CROSS JOIN lo CROSS JOIN hi""".stripMargin
  }

  /** Kaplan–Meier replay: exact-micros durations (ts_ns // 1000, hour DIV),
    * exact-BIGINT risk sets via the bounded before-window, one e6 ln per
    * event time BEFORE the cumulative sum, pure-integer Nelson–Aalen terms
    * (d·10⁶ // n, non-negative), terminal n=d row NULL by the same CASE.
    */
  private[graft] lazy val SurvivalOracleSql: String =
    s"""WITH ev AS (SELECT user_id AS u, event_type AS et, epoch_ns(ts) // 1000 AS t_us
       |            FROM events),
       |pu AS (SELECT u, min(t_us) AS t0,
       |              min(CASE WHEN et = 'purchase' THEN t_us END) AS tev,
       |              max(t_us) AS tl
       |       FROM ev GROUP BY u),
       |dur AS (SELECT (coalesce(tev, tl) - t0) // 3600000000 AS t,
       |               tev IS NOT NULL AS obs FROM pu),
       |g AS (SELECT t, CAST(count(*) AS BIGINT) AS all_n,
       |             CAST(sum(CASE WHEN obs THEN 1 ELSE 0 END) AS BIGINT) AS d
       |      FROM dur GROUP BY t),
       |nn AS (SELECT CAST(sum(all_n) AS BIGINT) AS nn FROM g),
       |r AS (SELECT t, all_n, d,
       |        nn.nn - CAST(coalesce(sum(all_n) OVER (
       |          ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |          AS BIGINT) AS n_risk
       |      FROM g CROSS JOIN nn),
       |e AS (SELECT t, n_risk, d,
       |        CASE WHEN d < n_risk
       |             THEN CAST(floor(ln(CAST(n_risk - d AS DOUBLE)
       |                    / CAST(n_risk AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
       |             ELSE CAST(0 AS BIGINT) END AS lnterm,
       |        d * 1000000 // n_risk AS naterm
       |      FROM r WHERE d > 0)
       |SELECT t, n_risk, d,
       |  CASE WHEN d < n_risk THEN CAST(sum(lnterm) OVER (
       |    ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) END
       |    AS km_ln_e6,
       |  CAST(sum(naterm) OVER (
       |    ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |    AS na_e6
       |FROM e""".stripMargin

  /** Log-rank replay: the q_survival_km duration derivation + the KS-arms
    * md5 split, per-duration 2×2 grid, exact-BIGINT per-arm risk sets via
    * the bounded before-window, E/V terms as fixed-spelling doubles over
    * exact integers (every factor cast individually) e6-quantized per
    * event time, z and the Zelen–Severo two-sided tail replayed verbatim.
    */
  private[graft] lazy val LogRankOracleSql: String =
    s"""WITH ev AS (SELECT user_id AS u, event_type AS et, epoch_ns(ts) // 1000 AS t_us
       |            FROM events),
       |pu AS (SELECT u, min(t_us) AS t0,
       |              min(CASE WHEN et = 'purchase' THEN t_us END) AS tev,
       |              max(t_us) AS tl
       |       FROM ev GROUP BY u),
       |dur AS (SELECT (coalesce(tev, tl) - t0) // 3600000000 AS t,
       |               tev IS NOT NULL AS obs,
       |               ('0x' || substring(md5(CAST(u AS VARCHAR)), 1, 12))::BIGINT % 2 AS arm
       |        FROM pu),
       |g AS (SELECT t,
       |        CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS an0,
       |        CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS an1,
       |        CAST(sum(CASE WHEN arm = 0 AND obs THEN 1 ELSE 0 END) AS BIGINT) AS dd0,
       |        CAST(sum(CASE WHEN arm = 1 AND obs THEN 1 ELSE 0 END) AS BIGINT) AS dd1
       |      FROM dur GROUP BY t),
       |nn AS (SELECT CAST(sum(an0) AS BIGINT) AS nn0,
       |              CAST(sum(an1) AS BIGINT) AS nn1 FROM g),
       |r AS (SELECT t, dd0, dd1, nn.nn0, nn.nn1,
       |        nn.nn0 - CAST(coalesce(sum(an0) OVER (
       |          ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |          AS BIGINT) AS n0r,
       |        nn.nn1 - CAST(coalesce(sum(an1) OVER (
       |          ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |          AS BIGINT) AS n1r
       |      FROM g CROSS JOIN nn),
       |e AS (SELECT nn0, nn1, dd0, dd1, n0r, n1r,
       |             dd0 + dd1 AS d, n0r + n1r AS nr
       |      FROM r WHERE dd0 + dd1 > 0),
       |tm AS (SELECT nn0, nn1, dd0, dd1,
       |         CAST(floor(CAST(d AS DOUBLE) * CAST(n1r AS DOUBLE) / CAST(nr AS DOUBLE)
       |              * 1000000.0 + 0.5) AS BIGINT) AS eterm,
       |         CASE WHEN nr > 1 THEN CAST(floor(
       |             CAST(d AS DOUBLE) * CAST(nr - d AS DOUBLE)
       |             * CAST(n0r AS DOUBLE) * CAST(n1r AS DOUBLE)
       |             / (CAST(nr AS DOUBLE) * CAST(nr AS DOUBLE) * CAST(nr - 1 AS DOUBLE))
       |             * 1000000.0 + 0.5) AS BIGINT) ELSE CAST(0 AS BIGINT) END AS vterm
       |       FROM e),
       |ag AS (SELECT CAST(max(nn0) AS BIGINT) AS n0, CAST(max(nn1) AS BIGINT) AS n1,
       |              CAST(sum(dd0) AS BIGINT) AS o0, CAST(sum(dd1) AS BIGINT) AS o1,
       |              CAST(sum(eterm) AS BIGINT) AS e1_e6,
       |              CAST(sum(vterm) AS BIGINT) AS v_e6
       |       FROM tm),
       |zz AS (SELECT n0, n1, o0, o1, e1_e6, v_e6,
       |         CASE WHEN v_e6 > 0 THEN CAST(o1 * 1000000 - e1_e6 AS DOUBLE)
       |              / (1000.0 * sqrt(CAST(v_e6 AS DOUBLE))) END AS z
       |       FROM ag),
       |tq AS (SELECT *, 1.0 / (1.0 + 0.2316419 * abs(z)) AS t FROM zz)
       |SELECT n0, n1, o0, o1, e1_e6, v_e6,
       |       CAST(floor(z * 1000000.0 + 0.5) AS BIGINT) AS z_e6,
       |       CAST(floor(2.0 * (exp(-0.5 * abs(z) * abs(z)) * 0.3989422804014327
       |         * (((((1.330274429 * t - 1.821255978) * t + 1.781477937) * t
       |              - 0.356563782) * t + 0.319381530) * t))
       |         * 1000000.0 + 0.5) AS BIGINT) AS p_e6
       |FROM tq""".stripMargin

  /** Stratified log-rank replay: the LogRankOracleSql chain with the grid,
    * totals, and before-windows keyed/partitioned by the per-user activity
    * tier, E/V terms e6-quantized per (stratum, time), strata-summed
    * BEFORE the single z — identical term spellings throughout.
    */
  private[graft] lazy val LogRankStratOracleSql: String =
    s"""WITH ev AS (SELECT user_id AS u, event_type AS et, epoch_ns(ts) // 1000 AS t_us
       |            FROM events),
       |pu AS (SELECT u, min(t_us) AS t0,
       |              min(CASE WHEN et = 'purchase' THEN t_us END) AS tev,
       |              max(t_us) AS tl, CAST(count(*) AS BIGINT) AS n_ev
       |       FROM ev GROUP BY u),
       |dur AS (SELECT least(n_ev // 20, 3) AS st,
       |               (coalesce(tev, tl) - t0) // 3600000000 AS t,
       |               tev IS NOT NULL AS obs,
       |               ('0x' || substring(md5(CAST(u AS VARCHAR)), 1, 12))::BIGINT % 2 AS arm
       |        FROM pu),
       |g AS (SELECT st, t,
       |        CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS an0,
       |        CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS an1,
       |        CAST(sum(CASE WHEN arm = 0 AND obs THEN 1 ELSE 0 END) AS BIGINT) AS dd0,
       |        CAST(sum(CASE WHEN arm = 1 AND obs THEN 1 ELSE 0 END) AS BIGINT) AS dd1
       |      FROM dur GROUP BY st, t),
       |tot AS (SELECT st, CAST(sum(an0) AS BIGINT) AS nn0,
       |               CAST(sum(an1) AS BIGINT) AS nn1 FROM g GROUP BY st),
       |r AS (SELECT g.st, g.t, g.dd0, g.dd1,
       |        tot.nn0 - CAST(coalesce(sum(g.an0) OVER (PARTITION BY g.st
       |          ORDER BY g.t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |          AS BIGINT) AS n0r,
       |        tot.nn1 - CAST(coalesce(sum(g.an1) OVER (PARTITION BY g.st
       |          ORDER BY g.t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |          AS BIGINT) AS n1r
       |      FROM g JOIN tot ON tot.st = g.st),
       |e AS (SELECT dd0, dd1, n0r, n1r, dd0 + dd1 AS d, n0r + n1r AS nr
       |      FROM r WHERE dd0 + dd1 > 0),
       |tm AS (SELECT dd0, dd1,
       |         CAST(floor(CAST(d AS DOUBLE) * CAST(n1r AS DOUBLE) / CAST(nr AS DOUBLE)
       |              * 1000000.0 + 0.5) AS BIGINT) AS eterm,
       |         CASE WHEN nr > 1 THEN CAST(floor(
       |             CAST(d AS DOUBLE) * CAST(nr - d AS DOUBLE)
       |             * CAST(n0r AS DOUBLE) * CAST(n1r AS DOUBLE)
       |             / (CAST(nr AS DOUBLE) * CAST(nr AS DOUBLE) * CAST(nr - 1 AS DOUBLE))
       |             * 1000000.0 + 0.5) AS BIGINT) ELSE CAST(0 AS BIGINT) END AS vterm
       |       FROM e),
       |sz AS (SELECT CAST(count(*) AS BIGINT) AS n_strata,
       |              CAST(sum(nn0) AS BIGINT) AS n0,
       |              CAST(sum(nn1) AS BIGINT) AS n1 FROM tot),
       |ag AS (SELECT CAST(sum(dd0) AS BIGINT) AS o0, CAST(sum(dd1) AS BIGINT) AS o1,
       |              CAST(sum(eterm) AS BIGINT) AS e1_e6,
       |              CAST(sum(vterm) AS BIGINT) AS v_e6
       |       FROM tm),
       |zz AS (SELECT sz.n_strata, sz.n0, sz.n1, ag.o0, ag.o1, ag.e1_e6, ag.v_e6,
       |         CASE WHEN ag.v_e6 > 0 THEN CAST(ag.o1 * 1000000 - ag.e1_e6 AS DOUBLE)
       |              / (1000.0 * sqrt(CAST(ag.v_e6 AS DOUBLE))) END AS z
       |       FROM sz CROSS JOIN ag),
       |tq AS (SELECT *, 1.0 / (1.0 + 0.2316419 * abs(z)) AS t FROM zz)
       |SELECT n_strata, n0, n1, o0, o1, e1_e6, v_e6,
       |       CAST(floor(z * 1000000.0 + 0.5) AS BIGINT) AS z_e6,
       |       CAST(floor(2.0 * (exp(-0.5 * abs(z) * abs(z)) * 0.3989422804014327
       |         * (((((1.330274429 * t - 1.821255978) * t + 1.781477937) * t
       |              - 0.356563782) * t + 0.319381530) * t))
       |         * 1000000.0 + 0.5) AS BIGINT) AS p_e6
       |FROM tq""".stripMargin

  /** DP-mean replay: the exact clamp-shift sum/count BIGINTs, both Laplace
    * draws from the identical md5-48 "salt:sum"/"salt:count" uniforms with
    * the scale constants spliced via Double.toString, the same
    * clamped-quotient post-processing, eps accounting as constants.
    */
  private[graft] lazy val DpMeanOracleSql: String = {
    val bSum = (2000.0d - 0.0d) / 0.5d
    val bCnt = 1.0d / 0.5d
    s"""WITH ag AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |              CAST(sum(least(greatest(CAST(n_chars AS BIGINT), 0), 2000) - 0)
       |                   AS BIGINT) AS s
       |            FROM documents),
       |nz AS (SELECT n, s,
       |         2.0 * ((('0x' || substring(md5('dp-r15:sum'), 1, 12))::BIGINT + 0.5)
       |                / 281474976710656.0) - 1.0 AS cs,
       |         2.0 * ((('0x' || substring(md5('dp-r15:count'), 1, 12))::BIGINT + 0.5)
       |                / 281474976710656.0) - 1.0 AS cc
       |       FROM ag),
       |rel AS (SELECT n,
       |          CAST(s AS DOUBLE) + (-$bSum) * sign(cs) * ln(1.0 - abs(cs)) AS ns,
       |          greatest(CAST(n AS DOUBLE) + (-$bCnt) * sign(cc) * ln(1.0 - abs(cc)),
       |                   CAST(1.0 AS DOUBLE)) AS nn
       |        FROM nz)
       |SELECT n, CAST(500000 AS BIGINT) AS eps_sum_e6,
       |       CAST(500000 AS BIGINT) AS eps_count_e6,
       |       CAST(1000000 AS BIGINT) AS eps_total_e6,
       |       CAST(floor((greatest(CAST(0.0 AS DOUBLE),
       |              least(CAST(2000.0 AS DOUBLE), ns / nn)) + 0.0)
       |            * 1000000.0 + 0.5) AS BIGINT) AS released_mean_e6
       |FROM rel""".stripMargin
  }

  /** Wilson replay: the SAME double-arithmetic text as
    * Binomial.wilson's selectExpr (z spliced from the one Z95 literal),
    * over the md5-arm conversion counts.
    */
  private[graft] lazy val WilsonOracleSql: String = {
    val zs = graft.operators.Binomial.Z95.toString
    s"""$FeaturesSql,
       |ar AS (SELECT ('0x' || substring(md5(user_session), 1, 12))::BIGINT % 2 AS arm,
       |              label
       |       FROM features),
       |m AS (SELECT arm, CAST(count(*) AS BIGINT) AS n,
       |             CAST(sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS pos
       |      FROM ar GROUP BY arm)
       |SELECT arm, n, pos,
       |  CAST(floor(CAST(pos AS DOUBLE) / CAST(n AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
       |    AS p_e6,
       |  CAST(floor(greatest(
       |    ((CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)) + $zs * $zs / (2.0 * CAST(n AS DOUBLE))
       |     - $zs * sqrt((CAST(pos AS DOUBLE) / CAST(n AS DOUBLE))
       |         * (1.0 - CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)
       |         + $zs * $zs / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
       |    / (1.0 + $zs * $zs / CAST(n AS DOUBLE)), 0.0) * 1000000.0 + 0.5) AS BIGINT)
       |    AS lo_e6,
       |  CAST(floor(least(
       |    ((CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)) + $zs * $zs / (2.0 * CAST(n AS DOUBLE))
       |     + $zs * sqrt((CAST(pos AS DOUBLE) / CAST(n AS DOUBLE))
       |         * (1.0 - CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)
       |         + $zs * $zs / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
       |    / (1.0 + $zs * $zs / CAST(n AS DOUBLE)), 1.0) * 1000000.0 + 0.5) AS BIGINT)
       |    AS hi_e6
       |FROM m""".stripMargin
  }

  /** Isotonic replay: the same tier table (PRF-oracle contingency CASEs),
    * exact range sums over the bounded (i, j) enumeration, one double
    * division per range, minimax via exact MIN/MAX (never a float sum).
    */
  private[graft] lazy val IsotonicOracleSql: String =
    s"""$FeaturesSql, sc AS (
       |  SELECT label, CASE WHEN cart_count >= 3 THEN 850000
       |       WHEN cart_count >= 1 THEN 600000 WHEN view_count >= 10 THEN 350000
       |       WHEN view_count >= 5 THEN 200000 ELSE 50000 END AS score_micros
       |  FROM features),
       |tiers AS (
       |  SELECT CAST(score_micros AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS pos
       |  FROM sc GROUP BY score_micros),
       |pre AS (SELECT s, n, pos, row_number() OVER (ORDER BY s) AS k FROM tiers),
       |rg AS (
       |  SELECT a.k AS i, b.k AS j,
       |         CAST(sum(m.pos) AS DOUBLE) / CAST(sum(m.n) AS DOUBLE) AS avgd
       |  FROM pre a JOIN pre b ON a.k <= b.k
       |  JOIN pre m ON m.k BETWEEN a.k AND b.k
       |  GROUP BY a.k, b.k),
       |inr AS (
       |  SELECT rg.i, p.k, min(rg.avgd) AS mn
       |  FROM rg JOIN pre p ON rg.i <= p.k AND rg.j >= p.k
       |  GROUP BY rg.i, p.k),
       |iso AS (SELECT k, max(mn) AS rate FROM inr GROUP BY k)
       |SELECT pre.s AS score_micros, pre.n, pre.pos,
       |       pre.pos * 1000000 // pre.n AS raw_rate_micros,
       |       CAST(floor(iso.rate * 1000000.0 + 0.5) AS BIGINT) AS iso_rate_micros
       |FROM pre JOIN iso USING (k)""".stripMargin

  /** κ/MCC agreement replay: the same contingency CASEs as the PRF oracle
    * at the 600000 tier, then the exact-integer κ ratio and the
    * fixed-spelling double MCC (4-factor product exceeds 2⁵³, so both
    * engines multiply the SAME doubles).
    */
  private[graft] lazy val AgreementOracleSql: String =
    s"""$FeaturesSql, sc AS (
       |  SELECT label, CASE WHEN cart_count >= 3 THEN 850000
       |       WHEN cart_count >= 1 THEN 600000 WHEN view_count >= 10 THEN 350000
       |       WHEN view_count >= 5 THEN 200000 ELSE 50000 END AS score_micros
       |  FROM features),
       |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(CASE WHEN score_micros >= 600000 AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |  CAST(sum(CASE WHEN score_micros >= 600000 AND label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       |  CAST(sum(CASE WHEN score_micros < 600000 AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       |  CAST(sum(CASE WHEN score_micros < 600000 AND label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
       |  FROM sc)
       |SELECT n, tp, fp, fn, tn,
       |  CASE WHEN n * n = (tp+fp)*(tp+fn) + (fn+tn)*(fp+tn) THEN CAST(0 AS BIGINT)
       |       ELSE CAST(floor(
       |         CAST(n * (tp+tn) - ((tp+fp)*(tp+fn) + (fn+tn)*(fp+tn)) AS DOUBLE)
       |         / CAST(n * n - ((tp+fp)*(tp+fn) + (fn+tn)*(fp+tn)) AS DOUBLE)
       |         * 1000000.0 + 0.5) AS BIGINT) END AS kappa_micros,
       |  CASE WHEN (tp+fp) = 0 OR (tp+fn) = 0 OR (tn+fp) = 0 OR (tn+fn) = 0
       |       THEN CAST(0 AS BIGINT)
       |       ELSE CAST(floor(
       |         CAST(tp*tn - fp*fn AS DOUBLE)
       |         / sqrt(CAST(tp+fp AS DOUBLE) * CAST(tp+fn AS DOUBLE)
       |                * CAST(tn+fp AS DOUBLE) * CAST(tn+fn AS DOUBLE))
       |         * 1000000.0 + 0.5) AS BIGINT) END AS mcc_micros
       |FROM m""".stripMargin

  /** Per-source bootstrap replay: BootstrapOracleSql's chain with the
    * source carried through and PARTITION BY source rank windows.
    */
  private[graft] lazy val BootstrapBySourceOracleSql: String = {
    val B = 100
    val loRank = math.max(1, math.floor(B * 0.025d).toInt)
    val hiRank = math.min(B, math.ceil(B * 0.975d).toInt)
    val wExpr = graft.operators.Bootstrap.PoissonCdf
      .map(c => s"(CASE WHEN u >= $c THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH base AS (SELECT source AS g, doc_id AS id, CAST(n_chars AS BIGINT) AS x
       |              FROM documents),
       |pt AS (SELECT g, CAST(count(*) AS BIGINT) AS n_rows,
       |         CAST(floor(CAST(sum(x) AS DOUBLE) * 1000000.0
       |              / CAST(count(*) AS DOUBLE) + 0.5) AS BIGINT) AS mean_e6
       |       FROM base GROUP BY g),
       |rep AS (SELECT g, id, x, unnest(range(0, $B)) AS b FROM base),
       |uw AS (SELECT g, b, x,
       |         CAST(('0x' || substring(md5(CAST(id AS VARCHAR) || ':' || b), 1, 12))::BIGINT
       |              AS DOUBLE) / ${graft.operators.Bootstrap.TwoPow48} AS u
       |       FROM rep),
       |ww AS (SELECT g, b, x, CAST($wExpr AS BIGINT) AS w FROM uw),
       |rm AS (SELECT g, b,
       |         CAST(floor(CAST(sum(w * x) AS DOUBLE) * 1000000.0
       |              / CAST(sum(w) AS DOUBLE) + 0.5) AS BIGINT) AS m
       |       FROM ww GROUP BY g, b HAVING sum(w) > 0),
       |rk AS (SELECT g, m, b,
       |              row_number() OVER (PARTITION BY g ORDER BY m, b) AS rn
       |       FROM rm),
       |lo AS (SELECT g, m AS lo_e6 FROM rk WHERE rn = $loRank),
       |hi AS (SELECT g, m AS hi_e6 FROM rk WHERE rn = $hiRank)
       |SELECT pt.g AS source, pt.n_rows, pt.mean_e6, lo.lo_e6, hi.hi_e6
       |FROM pt JOIN lo ON lo.g = pt.g JOIN hi ON hi.g = pt.g""".stripMargin
  }

  /** Two-arm uplift replay: md5-split arms over the session features, the
    * same Poisson weight chain as BootstrapOracleSql, per-replicate diff
    * of floor-rounded micro means, fixed-rank CI.
    */
  private[graft] lazy val BootstrapUpliftOracleSql: String = {
    val B = 100
    val loRank = math.max(1, math.floor(B * 0.025d).toInt)
    val hiRank = math.min(B, math.ceil(B * 0.975d).toInt)
    val wExpr = graft.operators.Bootstrap.PoissonCdf
      .map(c => s"(CASE WHEN u >= $c THEN 1 ELSE 0 END)").mkString(" + ")
    s"""$FeaturesSql,
       |bb AS (SELECT user_session AS id,
       |         ('0x' || substring(md5(user_session), 1, 12))::BIGINT % 2 AS a,
       |         CAST(label AS BIGINT) AS x
       |       FROM features),
       |pt AS (SELECT
       |         CAST(sum(CASE WHEN a = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
       |         CAST(sum(CASE WHEN a = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       |         CAST(sum(CASE WHEN a = 0 THEN x ELSE 0 END) AS BIGINT) AS s0,
       |         CAST(sum(CASE WHEN a = 1 THEN x ELSE 0 END) AS BIGINT) AS s1
       |       FROM bb),
       |ptd AS (SELECT n0, n1,
       |          CAST(floor(CAST(s1 AS DOUBLE) * 1000000.0 / CAST(n1 AS DOUBLE) + 0.5) AS BIGINT)
       |          - CAST(floor(CAST(s0 AS DOUBLE) * 1000000.0 / CAST(n0 AS DOUBLE) + 0.5) AS BIGINT)
       |            AS diff_e6
       |        FROM pt),
       |rep AS (SELECT id, a, x, unnest(range(0, $B)) AS b FROM bb),
       |uw AS (SELECT b, a, x,
       |         CAST(('0x' || substring(md5(id || ':' || b), 1, 12))::BIGINT AS DOUBLE)
       |           / ${graft.operators.Bootstrap.TwoPow48} AS u
       |       FROM rep),
       |ww AS (SELECT b, a, x, CAST($wExpr AS BIGINT) AS w FROM uw),
       |rm AS (SELECT b,
       |         CAST(floor(CAST(sum(CASE WHEN a = 1 THEN w * x ELSE 0 END) AS DOUBLE) * 1000000.0
       |              / CAST(sum(CASE WHEN a = 1 THEN w ELSE 0 END) AS DOUBLE) + 0.5) AS BIGINT)
       |         - CAST(floor(CAST(sum(CASE WHEN a = 0 THEN w * x ELSE 0 END) AS DOUBLE) * 1000000.0
       |              / CAST(sum(CASE WHEN a = 0 THEN w ELSE 0 END) AS DOUBLE) + 0.5) AS BIGINT) AS m
       |       FROM ww GROUP BY b
       |       HAVING sum(CASE WHEN a = 0 THEN w ELSE 0 END) > 0
       |          AND sum(CASE WHEN a = 1 THEN w ELSE 0 END) > 0),
       |rk AS (SELECT m, b, row_number() OVER (ORDER BY m, b) AS rn FROM rm),
       |lo AS (SELECT m AS lo_e6 FROM rk WHERE rn = $loRank),
       |hi AS (SELECT m AS hi_e6 FROM rk WHERE rn = $hiRank)
       |SELECT ptd.n0, ptd.n1, ptd.diff_e6, lo.lo_e6, hi.hi_e6
       |FROM ptd CROSS JOIN lo CROSS JOIN hi""".stripMargin
  }

}
