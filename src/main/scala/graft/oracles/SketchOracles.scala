package graft.oracles

import graft.functions.Money
import graft.oracles.SharedCtes._

/** Generated DuckDB oracle replays: sketch and privacy-audit family
  * (CMS, HLL, bottom-k, HyperBall, k-anonymity...).
  *
  * Moved verbatim out of SparkEntry.scala (r18 split); the
  * `SparkEntry.oracleSql` map keeps every `"q..." ->` key and
  * references these by name.
  */
private[graft] object SketchOracles {

  /** Shared QI projection for the privacy oracles — mirrors privacyQi. */
  private[graft] lazy val PrivacyQiSql: String =
    """qi AS (SELECT c_mktsegment AS seg, c_nationkey AS nat,
      |              CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS band
      |       FROM customer)""".stripMargin

  /** k-anonymity replay: the same ROLLUP chain (GROUPING_ID bit order
    * matches Spark, MSB = first col), exact BIGINT class sizes, the one
    * double division floored at e6.
    */
  private[graft] lazy val KAnonOracleSql: String =
    s"""WITH $PrivacyQiSql,
       |cls AS (SELECT CAST(GROUPING_ID(seg, nat, band) AS BIGINT) AS gid,
       |               CAST(count(*) AS BIGINT) AS k
       |        FROM qi GROUP BY ROLLUP(seg, nat, band))
       |SELECT gid, CAST(count(*) AS BIGINT) AS n_groups,
       |       CAST(min(k) AS BIGINT) AS min_k,
       |       CAST(sum(CASE WHEN k < 5 THEN 1 ELSE 0 END) AS BIGINT) AS suppressed_groups,
       |       CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT) AS suppressed_rows,
       |       CAST(sum(k) AS BIGINT) AS total_rows,
       |       CAST(floor(CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) AS DOUBLE)
       |            * 1000000.0 / CAST(sum(k) AS DOUBLE)) AS BIGINT) AS suppressed_frac_e6
       |FROM cls GROUP BY gid""".stripMargin

  /** l-diversity replay: per-(seg, nat) distinct band count, histogram over l. */
  private[graft] lazy val LDiversityOracleSql: String =
    s"""WITH $PrivacyQiSql,
       |g AS (SELECT seg, nat, CAST(count(DISTINCT band) AS BIGINT) AS l,
       |             CAST(count(*) AS BIGINT) AS k
       |      FROM qi GROUP BY seg, nat)
       |SELECT l, CAST(count(*) AS BIGINT) AS n_groups, CAST(sum(k) AS BIGINT) AS n_rows
       |FROM g GROUP BY l""".stripMargin

  /** DP-histogram replay: the identical md5-48 uniform ("dp-r17:key"), the
    * identically-spelled Laplace inverse CDF (left-assoc products, one e6
    * ln-class quantization at the end), nonnegative clamp.
    */
  private[graft] lazy val DpHistogramOracleSql: String =
    s"""WITH cnt AS (SELECT CAST(event_type AS VARCHAR) AS key,
       |                    CAST(count(*) AS BIGINT) AS n
       |             FROM events GROUP BY 1),
       |nz AS (SELECT key, n,
       |         2.0 * ((('0x' || substring(md5('dp-r17:' || key), 1, 12))::BIGINT + 0.5)
       |                / 281474976710656.0) - 1.0 AS c
       |       FROM cnt)
       |SELECT key,
       |  CAST(floor(greatest(0.0,
       |    CAST(n AS DOUBLE) + (-1.0 / 1.0) * sign(c) * ln(1.0 - abs(c)))
       |    * 1000000.0 + 0.5) AS BIGINT) AS released_e6
       |FROM nz""".stripMargin

  /** Count-Min replay: the identical md5-48 "item:j" hash family
    * (CountMin.bucket), the full d×w counter build, exact top-20 probe set
    * (count desc, item asc), min-over-rows estimate — every value an exact
    * BIGINT, so the sketch itself is the oracled artifact.
    */
  private[graft] lazy val CmsOracleSql: String =
    s"""WITH ev AS (SELECT CAST(user_id AS VARCHAR) AS item FROM events),
       |hx AS (SELECT item, j,
       |              ('0x' || substring(md5(item || ':' || j), 1, 12))::BIGINT % 64 AS h
       |       FROM ev CROSS JOIN range(0, 4) t(j)),
       |ctr AS (SELECT j, h, CAST(count(*) AS BIGINT) AS c FROM hx GROUP BY 1, 2),
       |ex AS (SELECT item, CAST(count(*) AS BIGINT) AS exact_n FROM ev GROUP BY 1),
       |top AS (SELECT item, exact_n FROM ex ORDER BY exact_n DESC, item LIMIT 20),
       |pr AS (SELECT t.item, t.exact_n, r.j,
       |              ('0x' || substring(md5(t.item || ':' || r.j), 1, 12))::BIGINT % 64 AS h
       |       FROM top t CROSS JOIN range(0, 4) r(j)),
       |est AS (SELECT pr.item, pr.exact_n, CAST(min(ctr.c) AS BIGINT) AS est_n
       |        FROM pr JOIN ctr ON ctr.j = pr.j AND ctr.h = pr.h
       |        GROUP BY 1, 2)
       |SELECT item AS user_id, exact_n, est_n, est_n - exact_n AS overcount,
       |       est_n >= exact_n AS ge_ok
       |FROM est""".stripMargin

  /** Sketch-bracket replay: the CmsOracleSql counter/probe chain for the
    * exact and CMS columns; the MG booleans are the STRUCTURAL guarantees
    * (lower bound / n-over-k-plus-1 slack) emitted as literal TRUE — the
    * q_hll_rollup_checked pattern: only a broken sketch can flip them.
    */
  private[graft] lazy val SketchBracketOracleSql: String =
    s"""WITH ev AS (SELECT CAST(user_id AS VARCHAR) AS item FROM events),
       |hx AS (SELECT item, j,
       |              ('0x' || substring(md5(item || ':' || j), 1, 12))::BIGINT % 64 AS h
       |       FROM ev CROSS JOIN range(0, 4) t(j)),
       |ctr AS (SELECT j, h, CAST(count(*) AS BIGINT) AS c FROM hx GROUP BY 1, 2),
       |ex AS (SELECT item, CAST(count(*) AS BIGINT) AS exact_n FROM ev GROUP BY 1),
       |top AS (SELECT item, exact_n FROM ex ORDER BY exact_n DESC, item LIMIT 20),
       |pr AS (SELECT t.item, t.exact_n, r.j,
       |              ('0x' || substring(md5(t.item || ':' || r.j), 1, 12))::BIGINT % 64 AS h
       |       FROM top t CROSS JOIN range(0, 4) r(j)),
       |est AS (SELECT pr.item, pr.exact_n, CAST(min(ctr.c) AS BIGINT) AS est_n
       |        FROM pr JOIN ctr ON ctr.j = pr.j AND ctr.h = pr.h
       |        GROUP BY 1, 2)
       |SELECT item AS user_id, exact_n, est_n, est_n - exact_n AS overcount,
       |       TRUE AS lower_ok, TRUE AS slack_ok,
       |       est_n >= exact_n AS bracket_ok
       |FROM est""".stripMargin

  /** HLL replay: the identical md5-48 hash split into (low-6-bit register,
    * 42-bit remainder), `length(bin(x))` highest-set-bit, exact-BIGINT
    * dyadic harmonic sum, the one α·m²·2⁵⁰/s double division e6-quantized,
    * the linear-counting branch decided on the QUANTIZED raw, and the ALL
    * row max-merged from the per-group register tables — the sketch, the
    * merge and the estimator are all the oracled artifact.
    */
  private[graft] lazy val HllOracleSql: String = {
    val a = graft.operators.HllReplay.Alpha64.toString
    s"""WITH it AS (
       |  SELECT DISTINCT CAST(event_type AS VARCHAR) AS g,
       |         CAST(user_id AS VARCHAR) || '_' || strftime(ts, '%Y-%m-%d') AS item
       |  FROM events),
       |rr AS (SELECT g,
       |         ('0x' || substring(md5(item), 1, 12))::BIGINT % 64 AS reg,
       |         ('0x' || substring(md5(item), 1, 12))::BIGINT // 64 AS rem
       |       FROM it),
       |rho AS (SELECT g, reg,
       |          CASE WHEN rem = 0 THEN 43 ELSE 43 - length(bin(rem)) END AS rho
       |        FROM rr),
       |regs AS (SELECT g, reg, CAST(max(rho) AS BIGINT) AS m FROM rho GROUP BY 1, 2),
       |au AS (SELECT g, reg, m FROM regs
       |       UNION ALL
       |       SELECT 'ALL' AS g, reg, CAST(max(m) AS BIGINT) AS m FROM regs GROUP BY reg),
       |agg AS (SELECT g, CAST(count(*) AS BIGINT) AS nz,
       |               CAST(sum(CAST(power(2, 50 - m) AS BIGINT)) AS BIGINT) AS s
       |        FROM au GROUP BY 1),
       |est AS (SELECT g, nz,
       |          CAST($a AS DOUBLE) * 4096.0 * 1125899906842624.0
       |            / CAST(s + (64 - nz) * 1125899906842624 AS DOUBLE) AS raw
       |        FROM agg),
       |fin AS (SELECT g, nz,
       |          CASE WHEN CAST(floor(raw * 1000000.0 + 0.5) AS BIGINT) <= 160000000
       |                    AND nz < 64
       |               THEN CAST(floor(64.0 * ln(64.0 / CAST(64 - nz AS DOUBLE))
       |                          * 1000000.0 + 0.5) AS BIGINT)
       |               ELSE CAST(floor(raw * 1000000.0 + 0.5) AS BIGINT) END AS est_e6
       |        FROM est),
       |ex AS (SELECT g, CAST(count(*) AS BIGINT) AS exact_n FROM it GROUP BY g
       |       UNION ALL
       |       SELECT 'ALL' AS g, CAST(count(DISTINCT item) AS BIGINT) AS exact_n FROM it)
       |SELECT fin.g AS event_type, ex.exact_n, fin.nz, fin.est_e6
       |FROM fin JOIN ex ON fin.g = ex.g""".stripMargin
  }

  /** q_incremental_stats replay: computes the per-type statistics DIRECTLY
    * over the full event table (no split, no merge) with [[HllOracleSql]]'s
    * register/estimate chain — hash equality against the Spark side's
    * two-half state merge is exactly the "merge ≡ recompute" identity the
    * operator claims.
    */
  private[graft] lazy val IncrementalStatsOracleSql: String = {
    val a = graft.operators.HllReplay.Alpha64.toString
    s"""WITH e AS (
       |  SELECT event_type AS g,
       |         CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS v,
       |         CAST(user_id AS VARCHAR) AS item
       |  FROM events WHERE value IS NOT NULL),
       |sc AS (
       |  SELECT g, CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS sum_v,
       |         CAST(min(v) AS BIGINT) AS mn, CAST(max(v) AS BIGINT) AS mx
       |  FROM e GROUP BY g),
       |rr AS (SELECT g,
       |         ('0x' || substring(md5(item), 1, 12))::BIGINT % 64 AS reg,
       |         ('0x' || substring(md5(item), 1, 12))::BIGINT // 64 AS rem
       |       FROM e),
       |rho AS (SELECT g, reg,
       |          CASE WHEN rem = 0 THEN 43 ELSE 43 - length(bin(rem)) END AS rho
       |        FROM rr),
       |regs AS (SELECT g, reg, CAST(max(rho) AS BIGINT) AS m FROM rho GROUP BY 1, 2),
       |agg AS (SELECT g, CAST(count(*) AS BIGINT) AS nz,
       |               CAST(sum(CAST(power(2, 50 - m) AS BIGINT)) AS BIGINT) AS s
       |        FROM regs GROUP BY 1),
       |est AS (SELECT g, nz,
       |          CAST($a AS DOUBLE) * 4096.0 * 1125899906842624.0
       |            / CAST(s + (64 - nz) * 1125899906842624 AS DOUBLE) AS raw
       |        FROM agg),
       |fin AS (SELECT g, nz,
       |          CASE WHEN CAST(floor(raw * 1000000.0 + 0.5) AS BIGINT) <= 160000000
       |                    AND nz < 64
       |               THEN CAST(floor(64.0 * ln(64.0 / CAST(64 - nz AS DOUBLE))
       |                          * 1000000.0 + 0.5) AS BIGINT)
       |               ELSE CAST(floor(raw * 1000000.0 + 0.5) AS BIGINT) END AS est_e6
       |        FROM est)
       |SELECT sc.g AS event_type, sc.n, sc.sum_v, sc.mn, sc.mx, fin.nz, fin.est_e6
       |FROM sc JOIN fin ON sc.g = fin.g""".stripMargin
  }

  /** q_quantile_sketch replay: same md5-48 bottom-k sample, the
    * [[FunnelQuantilesSql]] rank-bracket interpolation over the SAMPLE,
    * and the exact full-data rank audit — all integer/identical-IEEE.
    */
  private[graft] lazy val QuantileSketchOracleSql: String = {
    val ps = graft.operators.QuantileSketch.Deciles
    def lo(p: Int) = s"CAST(floor(((nn - 1) * $p) / CAST(100.0 AS DOUBLE)) AS BIGINT)"
    val abCols = ps.flatMap(p => Seq(
      s"max(CASE WHEN rn = ${lo(p)} THEN v END) AS a$p",
      s"max(CASE WHEN rn = least(${lo(p)} + 1, nn - 1) THEN v END) AS b$p"))
    val estRows = ps.map(p =>
      s"SELECT g, $p AS p, CAST(a$p AS DOUBLE) + ((ns - 1) * $p % 100) " +
        s"/ CAST(100.0 AS DOUBLE) * (b$p - a$p) AS est FROM br")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH e AS (
       |  SELECT event_type AS g,
       |         CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS v,
       |         ('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 12))::BIGINT AS hk,
       |         CAST(event_id AS BIGINT) AS rid
       |  FROM events WHERE value IS NOT NULL),
       |smp AS (
       |  SELECT g, v FROM (
       |    SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY hk, rid) AS sr
       |    FROM e)
       |  WHERE sr <= 256),
       |ranked AS (
       |  SELECT g, v,
       |         CAST(row_number() OVER (PARTITION BY g ORDER BY v) AS BIGINT) - 1 AS rn,
       |         CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS nn
       |  FROM smp),
       |br AS (
       |  SELECT g, CAST(count(*) AS BIGINT) AS ns,
       |         ${abCols.mkString(",\n         ")}
       |  FROM ranked GROUP BY g),
       |ests AS (
       |  $estRows),
       |nf AS (SELECT g, CAST(count(*) AS BIGINT) AS n_full FROM e GROUP BY g),
       |rk AS (
       |  SELECT ests.g, ests.p, ests.est,
       |         CAST(sum(CASE WHEN CAST(e.v AS DOUBLE) <= ests.est THEN 1 ELSE 0 END)
       |              AS BIGINT) AS rank
       |  FROM ests JOIN e ON e.g = ests.g GROUP BY 1, 2, 3)
       |SELECT rk.g AS event_type, rk.p, rk.est,
       |       rank * 1000000 // n_full AS rank_e6,
       |       CAST(abs(rank * 1000000 // n_full - CAST(rk.p AS BIGINT) * 10000)
       |            AS BIGINT) AS err_e6
       |FROM rk JOIN nf ON nf.g = rk.g""".stripMargin
  }

  /** q_user_overlap replay: the same md5-48 bottom-k coordinated samples,
    * per-pair union with side flags, k-th-order-statistic union inversion,
    * and the exact full-set audit — all integer arithmetic.
    */
  private[graft] lazy val UserOverlapOracleSql: String =
    """WITH m AS (
      |  SELECT DISTINCT CAST(event_type AS VARCHAR) AS g,
      |         CAST(user_id AS VARCHAR) AS member
      |  FROM events),
      |h AS (SELECT g, member,
      |        ('0x' || substring(md5(member), 1, 12))::BIGINT AS hk
      |      FROM m),
      |smp AS (SELECT g, member, hk FROM (
      |          SELECT g, member, hk,
      |                 row_number() OVER (PARTITION BY g ORDER BY hk, member) AS sr
      |          FROM h)
      |        WHERE sr <= 256),
      |gs AS (SELECT DISTINCT g FROM smp),
      |pairs AS (SELECT a.g AS ga, b.g AS gb FROM gs a, gs b WHERE a.g < b.g),
      |tagged AS (
      |  SELECT p.ga, p.gb, s.member, s.hk, 1 AS in_a, 0 AS in_b
      |  FROM pairs p JOIN smp s ON s.g = p.ga
      |  UNION ALL
      |  SELECT p.ga, p.gb, s.member, s.hk, 0, 1
      |  FROM pairs p JOIN smp s ON s.g = p.gb),
      |unioned AS (
      |  SELECT ga, gb, member, hk,
      |         CAST(max(in_a) AS BIGINT) AS in_a, CAST(max(in_b) AS BIGINT) AS in_b
      |  FROM tagged GROUP BY 1, 2, 3, 4),
      |kept AS (SELECT * FROM (
      |           SELECT u.*, row_number() OVER (PARTITION BY ga, gb
      |                                          ORDER BY hk, member) AS ur
      |           FROM unioned u)
      |         WHERE ur <= 256),
      |est AS (
      |  SELECT ga, gb, CAST(count(*) AS BIGINT) AS k_used,
      |         CAST(sum(in_a * in_b) AS BIGINT) AS n_both,
      |         CAST(max(hk) AS BIGINT) AS hk_top
      |  FROM kept GROUP BY 1, 2),
      |est2 AS (
      |  SELECT ga, gb, k_used,
      |         n_both * 1000000 // k_used AS jacc_est_e6,
      |         CASE WHEN k_used < 256 THEN k_used
      |              ELSE (k_used - 1) * 281474976710656 // greatest(hk_top, 1)
      |         END AS union_est
      |  FROM est),
      |est3 AS (SELECT *, jacc_est_e6 * union_est // 1000000 AS inter_est FROM est2),
      |sz AS (SELECT g, CAST(count(*) AS BIGINT) AS sz FROM m GROUP BY g),
      |inter AS (
      |  SELECT a.g AS ga, b.g AS gb, CAST(count(*) AS BIGINT) AS n_inter
      |  FROM m a JOIN m b ON a.member = b.member AND a.g < b.g
      |  GROUP BY 1, 2),
      |ex AS (
      |  SELECT p.ga, p.gb, coalesce(i.n_inter, 0) AS n_inter,
      |         sa.sz + sb.sz - coalesce(i.n_inter, 0) AS exact_union
      |  FROM pairs p
      |  JOIN sz sa ON sa.g = p.ga
      |  JOIN sz sb ON sb.g = p.gb
      |  LEFT JOIN inter i ON i.ga = p.ga AND i.gb = p.gb)
      |SELECT e.ga AS group_a, e.gb AS group_b, k_used, jacc_est_e6, union_est,
      |       inter_est,
      |       CAST(n_inter * 1000000 // exact_union AS BIGINT) AS exact_jacc_e6,
      |       CAST(exact_union AS BIGINT) AS exact_union
      |FROM est3 e JOIN ex ON ex.ga = e.ga AND ex.gb = e.gb""".stripMargin

  /** Generated HyperBall replay over the shared [[EdgesCte]] graph: md5-48
    * singleton counters, 3 unrolled register-MAX merge rounds (edge join +
    * (g, reg) max — [[KCoreOracleSql]]'s MATERIALIZED discipline), and
    * [[HllOracleSql]]'s estimate chain cloned per round.
    */
  private[graft] lazy val HyperBallOracleSql: String = {
    val a = graft.operators.HllReplay.Alpha64.toString
    def md(x: String) = s"('0x' || substring(md5($x), 1, 12))::BIGINT"
    val rounds = (1 to 3).map { r =>
      s"""hp$r AS (SELECT bi.a AS g, c.reg, c.m FROM bi JOIN hr${r - 1} c ON c.g = bi.b),
         |hr$r AS MATERIALIZED (
         |  SELECT g, reg, CAST(max(m) AS BIGINT) AS m
         |  FROM (SELECT g, reg, m FROM hr${r - 1} UNION ALL SELECT g, reg, m FROM hp$r)
         |  GROUP BY g, reg)""".stripMargin
    }.mkString(",\n")
    val ests = (0 to 3).map { r =>
      s"""ha$r AS (SELECT g, CAST(count(*) AS BIGINT) AS nz,
         |                CAST(sum(CAST(power(2, 50 - m) AS BIGINT)) AS BIGINT) AS s
         |         FROM hr$r GROUP BY g),
         |he$r AS (SELECT $r AS t, g AS node, nz,
         |           CAST($a AS DOUBLE) * 4096.0 * 1125899906842624.0
         |             / CAST(s + (64 - nz) * 1125899906842624 AS DOUBLE) AS raw
         |         FROM ha$r)""".stripMargin
    }.mkString(",\n")
    val sel = (0 to 3).map { r =>
      s"""SELECT t, node, nz,
         |       CASE WHEN CAST(floor(raw * 1000000.0 + 0.5) AS BIGINT) <= 160000000
         |                 AND nz < 64
         |            THEN CAST(floor(64.0 * ln(64.0 / CAST(64 - nz AS DOUBLE))
         |                       * 1000000.0 + 0.5) AS BIGINT)
         |            ELSE CAST(floor(raw * 1000000.0 + 0.5) AS BIGINT) END AS est_e6
         |FROM he$r""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""$EdgesCte,
       |hn AS (SELECT DISTINCT a AS node FROM bi),
       |hr0 AS MATERIALIZED (
       |  SELECT node AS g, ${md("CAST(node AS VARCHAR)")} % 64 AS reg,
       |         CAST(CASE WHEN ${md("CAST(node AS VARCHAR)")} // 64 = 0 THEN 43
       |              ELSE 43 - length(bin(${md("CAST(node AS VARCHAR)")} // 64)) END AS BIGINT) AS m
       |  FROM hn),
       |$rounds,
       |$ests
       |$sel""".stripMargin
  }

  /** PSI replay: the same Laplace-smoothed grid (sources × range(10) with
    * zero-filled buckets), one e6 ln per cell, non-negative integer terms
    * (diff_num and the ln always share a sign), exact BIGINT per-source
    * sums.
    */
  private[graft] lazy val PsiOracleSql: String =
    s"""WITH dd AS (SELECT source, least(n_chars // 64, 9) AS b FROM documents),
       |gb AS (SELECT source, b, CAST(count(*) AS BIGINT) AS cg FROM dd GROUP BY 1, 2),
       |cb AS (SELECT b, CAST(count(*) AS BIGINT) AS cc FROM dd GROUP BY 1),
       |ngt AS (SELECT source, CAST(count(*) AS BIGINT) AS ng FROM dd GROUP BY 1),
       |nnt AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM dd),
       |grid AS (
       |  SELECT g.source, t.b, ngt.ng, nnt.nn,
       |         coalesce(gb.cg, 0) AS cg, coalesce(cb.cc, 0) AS cc
       |  FROM (SELECT DISTINCT source FROM dd) g
       |  CROSS JOIN range(0, 10) t(b)
       |  LEFT JOIN gb ON gb.source = g.source AND gb.b = t.b
       |  LEFT JOIN cb ON cb.b = t.b
       |  JOIN ngt ON ngt.source = g.source
       |  CROSS JOIN nnt),
       |tm AS (
       |  SELECT source, ng,
       |         ((cg + 1) * (nn + 10) - (ng + 10) * (cc + 1))
       |           * CAST(floor(ln(CAST((cg + 1) * (nn + 10) AS DOUBLE)
       |                 / CAST((ng + 10) * (cc + 1) AS DOUBLE)) * 1000000.0 + 0.5)
       |             AS BIGINT)
       |           // ((ng + 10) * (nn + 10)) AS term
       |  FROM grid)
       |SELECT source, ng AS n_rows, CAST(sum(term) AS BIGINT) AS psi_e6
       |FROM tm GROUP BY source, ng""".stripMargin
}
