package graft.oracles

import graft.oracles.SharedCtes._

/** Generated DuckDB replays of the generation-eval operators
  * (operators/Bleu.scala, BradleyTerry.scala, Agreement.scala,
  * PassAtK.scala) — every pre-double sum an exact BIGINT, every double
  * spelled term-for-term as the Spark side spells it, round-6 at the end.
  */
private[graft] object EvalOracles {

  /** Adjacent-doc candidate/reference pairs + per-(pair, n) clipped-match
    * and total gram counts — the shared head of the BLEU and ROUGE
    * oracles. `maxN` mirrors Bleu.clippedStats' maxN.
    */
  private def pairStatsCtes(maxN: Int): String = {
    val ns = (1 to maxN).mkString(", ")
    s"""WITH t AS (SELECT doc_id, source, $TokensSql AS toks FROM documents),
       |pr AS MATERIALIZED (
       |       SELECT a.doc_id AS pair_id, a.source, a.toks AS cand, b.toks AS ref
       |       FROM t a JOIN t b ON b.doc_id = a.doc_id + 1
       |       WHERE a.doc_id % 2 = 0),
       |ns AS (SELECT unnest([$ns]) AS n),
       |cg AS (SELECT pair_id, n,
       |         unnest(list_transform(generate_series(1, len(cand) - n + 1),
       |                i -> array_to_string(cand[i:i+n-1], ' '))) AS g
       |       FROM pr CROSS JOIN ns),
       |rg AS (SELECT pair_id, n,
       |         unnest(list_transform(generate_series(1, len(ref) - n + 1),
       |                i -> array_to_string(ref[i:i+n-1], ' '))) AS g
       |       FROM pr CROSS JOIN ns),
       |cc AS (SELECT pair_id, n, g, CAST(count(*) AS BIGINT) AS c FROM cg GROUP BY 1, 2, 3),
       |rc AS (SELECT pair_id, n, g, CAST(count(*) AS BIGINT) AS r FROM rg GROUP BY 1, 2, 3),
       |mm AS (SELECT cc.pair_id, cc.n, CAST(sum(LEAST(cc.c, rc.r)) AS BIGINT) AS m
       |       FROM cc JOIN rc ON rc.pair_id = cc.pair_id AND rc.n = cc.n AND rc.g = cc.g
       |       GROUP BY 1, 2),
       |base AS (SELECT pair_id, source, n,
       |           CAST(GREATEST(len(cand) - n + 1, 0) AS BIGINT) AS tc,
       |           CAST(GREATEST(len(ref) - n + 1, 0) AS BIGINT) AS tr
       |         FROM pr CROSS JOIN ns),
       |pm AS (SELECT base.pair_id, base.source, base.n, base.tc, base.tr,
       |         coalesce(mm.m, 0) AS m
       |       FROM base LEFT JOIN mm ON mm.pair_id = base.pair_id AND mm.n = base.n)""".stripMargin
  }

  /** Corpus BLEU-4 per source: p_n from source-summed clipped counts, the
    * ln-sum parenthesized left-to-right exactly as the Spark chain, zero
    * when any order has no match (LEAST, never a product — width-safe).
    */
  private[graft] lazy val BleuOracleSql: String =
    s"""${pairStatsCtes(4)},
       |ag AS (SELECT source,
       |         CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs,
       |         CAST(sum(CASE WHEN n = 1 THEN m END) AS BIGINT) AS m1,
       |         CAST(sum(CASE WHEN n = 2 THEN m END) AS BIGINT) AS m2,
       |         CAST(sum(CASE WHEN n = 3 THEN m END) AS BIGINT) AS m3,
       |         CAST(sum(CASE WHEN n = 4 THEN m END) AS BIGINT) AS m4,
       |         CAST(sum(CASE WHEN n = 1 THEN tc END) AS BIGINT) AS t1,
       |         CAST(sum(CASE WHEN n = 2 THEN tc END) AS BIGINT) AS t2,
       |         CAST(sum(CASE WHEN n = 3 THEN tc END) AS BIGINT) AS t3,
       |         CAST(sum(CASE WHEN n = 4 THEN tc END) AS BIGINT) AS t4,
       |         CAST(sum(CASE WHEN n = 1 THEN tr END) AS BIGINT) AS ref_tokens
       |       FROM pm GROUP BY 1),
       |fin AS (SELECT source, n_pairs, t1, ref_tokens,
       |          CASE WHEN t1 > 0 THEN CAST(m1 AS DOUBLE) / CAST(t1 AS DOUBLE) ELSE 0.0 END AS p1d,
       |          CASE WHEN t2 > 0 THEN CAST(m2 AS DOUBLE) / CAST(t2 AS DOUBLE) ELSE 0.0 END AS p2d,
       |          CASE WHEN t3 > 0 THEN CAST(m3 AS DOUBLE) / CAST(t3 AS DOUBLE) ELSE 0.0 END AS p3d,
       |          CASE WHEN t4 > 0 THEN CAST(m4 AS DOUBLE) / CAST(t4 AS DOUBLE) ELSE 0.0 END AS p4d,
       |          CASE WHEN t1 = 0 THEN 0.0
       |               WHEN t1 >= ref_tokens THEN 1.0
       |               ELSE exp(1.0 - CAST(ref_tokens AS DOUBLE) / CAST(t1 AS DOUBLE)) END AS bpd,
       |          LEAST(m1, LEAST(m2, LEAST(m3, m4))) AS mmin
       |        FROM ag)
       |SELECT source, n_pairs, t1 AS cand_tokens, ref_tokens,
       |       round(p1d, 6) AS p1, round(p2d, 6) AS p2,
       |       round(p3d, 6) AS p3, round(p4d, 6) AS p4,
       |       round(bpd, 6) AS bp,
       |       round(CASE WHEN mmin = 0 THEN 0.0
       |                  ELSE bpd * exp(0.25 * (((ln(p1d) + ln(p2d)) + ln(p3d)) + ln(p4d)))
       |             END, 6) AS bleu
       |FROM fin""".stripMargin

  /** ROUGE-1/2 per source: per-pair P/R/F1 quantized to e6 micros (exact
    * BIGINT sums), macro-averaged over every pair of the source.
    */
  private[graft] lazy val RougeOracleSql: String =
    s"""${pairStatsCtes(2)},
       |per AS (SELECT source, n, m,
       |          CASE WHEN tc > 0 THEN CAST(m AS DOUBLE) / CAST(tc AS DOUBLE) ELSE 0.0 END AS pd,
       |          CASE WHEN tr > 0 THEN CAST(m AS DOUBLE) / CAST(tr AS DOUBLE) ELSE 0.0 END AS rd
       |        FROM pm),
       |mi AS (SELECT source, n,
       |         CAST(floor(pd * 1000000.0 + 0.5) AS BIGINT) AS p_micros,
       |         CAST(floor(rd * 1000000.0 + 0.5) AS BIGINT) AS r_micros,
       |         CAST(floor(CASE WHEN m = 0 THEN 0.0
       |                         ELSE 2.0 * pd * rd / (pd + rd) END * 1000000.0 + 0.5)
       |              AS BIGINT) AS f_micros
       |       FROM per)
       |SELECT source, n, CAST(count(*) AS BIGINT) AS n_pairs,
       |       round(CAST(sum(p_micros) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1000000.0, 6) AS avg_p,
       |       round(CAST(sum(r_micros) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1000000.0, 6) AS avg_r,
       |       round(CAST(sum(f_micros) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1000000.0, 6) AS avg_f1
       |FROM mi GROUP BY 1, 2""".stripMargin

  /** Bradley–Terry MM replay: the k×k win matrix from adjacent-doc
    * cross-source contests, then `iters` unrolled CTE rounds of
    * p ← max(W·10¹² // Σ n_ij·10¹² // (p_i+p_j), 1) with the divisor-form
    * rescale — exact integer arithmetic term-for-term with
    * BradleyTerry.fit's Long loop (DuckDB // ≡ Spark/Scala / on
    * non-negative longs).
    */
  private[graft] lazy val BradleyTerryOracleSql: String = {
    val iters = 5
    // MATERIALIZED throughout: DuckDB inlines plain CTEs and every round
    // references the previous one several times — inlining would explode
    // the plan exponentially in the round count (the q_pagerank lesson)
    val iterCtes = (1 to iters).map { tt =>
      val prev = s"p${tt - 1}"
      s"""d$tt AS MATERIALIZED (SELECT bp.s AS source,
         |         CAST(sum((bp.n * 1000000000000) // (ps.p + po.p)) AS BIGINT) AS den
         |       FROM bp JOIN $prev ps ON ps.source = bp.s
         |               JOIN $prev po ON po.source = bp.o
         |       GROUP BY 1),
         |r$tt AS MATERIALIZED (SELECT it.source,
         |         GREATEST((coalesce(w.wins, 0) * 1000000000000) // d$tt.den, 1) AS praw
         |       FROM it LEFT JOIN w ON w.source = it.source
         |               JOIN d$tt ON d$tt.source = it.source),
         |p$tt AS MATERIALIZED (SELECT source,
         |         CAST(GREATEST(praw // GREATEST(
         |           (SELECT CAST(sum(praw) AS BIGINT) FROM r$tt)
         |             // ((SELECT k FROM kk) * 1000000), 1), 1) AS BIGINT) AS p
         |       FROM r$tt)""".stripMargin
    }.mkString(",\n")
    s"""WITH d AS (SELECT doc_id, source, n_chars FROM documents),
       |c AS MATERIALIZED (
       |      SELECT CASE WHEN a.n_chars > b.n_chars THEN a.source ELSE b.source END AS win,
       |             CASE WHEN a.n_chars > b.n_chars THEN b.source ELSE a.source END AS lose
       |      FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
       |      WHERE a.doc_id % 2 = 0 AND a.source <> b.source
       |        AND a.n_chars <> b.n_chars),
       |pr AS MATERIALIZED (
       |       SELECT LEAST(win, lose) AS i, GREATEST(win, lose) AS j,
       |              CAST(count(*) AS BIGINT) AS n,
       |              CAST(sum(CASE WHEN win < lose THEN 1 ELSE 0 END) AS BIGINT) AS wi
       |       FROM c GROUP BY 1, 2),
       |bp AS MATERIALIZED (
       |       SELECT i AS s, j AS o, n FROM pr
       |       UNION ALL SELECT j AS s, i AS o, n FROM pr),
       |w AS MATERIALIZED (
       |       SELECT win AS source, CAST(count(*) AS BIGINT) AS wins FROM c GROUP BY 1),
       |it AS MATERIALIZED (SELECT s AS source FROM bp GROUP BY 1),
       |kk AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS k FROM it),
       |gm AS MATERIALIZED (
       |       SELECT s AS source, CAST(sum(n) AS BIGINT) AS games FROM bp GROUP BY 1),
       |p0 AS MATERIALIZED (SELECT source, CAST(1000000 AS BIGINT) AS p FROM it),
       |$iterCtes
       |SELECT it.source, gm.games, CAST(coalesce(w.wins, 0) AS BIGINT) AS wins,
       |       p$iters.p AS strength_micros
       |FROM it JOIN gm ON gm.source = it.source
       |        LEFT JOIN w ON w.source = it.source
       |        JOIN p$iters ON p$iters.source = it.source""".stripMargin
  }

  /** Shared head of the agreement oracles: the three raters' categories,
    * per-doc category counts, and the per-language exact-BIGINT sums.
    */
  private lazy val agreementCtes: String =
    s"""WITH t AS (SELECT doc_id, lang, n_chars, $TokensSql AS toks FROM documents),
       |m AS (SELECT lang, n_chars,
       |        len(toks) AS ntok,
       |        len(list_distinct(toks)) AS ndis,
       |        len(array_to_string(toks, '')) AS tchars
       |      FROM t),
       |r AS (SELECT lang,
       |        CASE WHEN n_chars < 150 THEN 0 WHEN n_chars < 300 THEN 1 ELSE 2 END AS r1,
       |        CASE WHEN ntok = 0 THEN 0 WHEN ndis * 10 < ntok * 4 THEN 0
       |             WHEN ndis * 10 < ntok * 7 THEN 1 ELSE 2 END AS r2,
       |        CASE WHEN ntok = 0 THEN 0 WHEN tchars < ntok * 4 THEN 0
       |             WHEN tchars < ntok * 5 THEN 1 ELSE 2 END AS r3
       |      FROM m),
       |nj AS (SELECT lang,
       |         (CASE WHEN r1 = 0 THEN 1 ELSE 0 END + CASE WHEN r2 = 0 THEN 1 ELSE 0 END
       |          + CASE WHEN r3 = 0 THEN 1 ELSE 0 END) AS nj0,
       |         (CASE WHEN r1 = 1 THEN 1 ELSE 0 END + CASE WHEN r2 = 1 THEN 1 ELSE 0 END
       |          + CASE WHEN r3 = 1 THEN 1 ELSE 0 END) AS nj1,
       |         (CASE WHEN r1 = 2 THEN 1 ELSE 0 END + CASE WHEN r2 = 2 THEN 1 ELSE 0 END
       |          + CASE WHEN r3 = 2 THEN 1 ELSE 0 END) AS nj2
       |       FROM r),
       |g AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       |        CAST(sum(nj0 * nj0 + nj1 * nj1 + nj2 * nj2) AS BIGINT) AS s_sum,
       |        CAST(sum(nj0) AS BIGINT) AS c0,
       |        CAST(sum(nj1) AS BIGINT) AS c1,
       |        CAST(sum(nj2) AS BIGINT) AS c2
       |      FROM nj GROUP BY 1)""".stripMargin

  /** Fleiss' kappa per language over the three heuristic raters — the
    * five grouped sums are exact BIGINTs, κ is the only double.
    */
  private[graft] lazy val FleissKappaOracleSql: String =
    s"""$agreementCtes
       |SELECT lang, n_docs, s_sum, c0, c1, c2,
       |  CASE WHEN CAST(c0 * c0 + c1 * c1 + c2 * c2 AS DOUBLE)
       |            / CAST(9 * n_docs * n_docs AS DOUBLE) = 1.0 THEN 0.0
       |       ELSE round(
       |         (CAST(s_sum - 3 * n_docs AS DOUBLE) / CAST(6 * n_docs AS DOUBLE)
       |          - CAST(c0 * c0 + c1 * c1 + c2 * c2 AS DOUBLE)
       |            / CAST(9 * n_docs * n_docs AS DOUBLE))
       |         / (1.0 - CAST(c0 * c0 + c1 * c1 + c2 * c2 AS DOUBLE)
       |                  / CAST(9 * n_docs * n_docs AS DOUBLE)), 6) END AS kappa
       |FROM g""".stripMargin

  /** Krippendorff's α (nominal) per language — same grouped sums, the
    * D_o/D_e numerators shipped as exact BIGINT columns.
    */
  private[graft] lazy val KrippendorffOracleSql: String =
    s"""$agreementCtes
       |SELECT lang, n_docs,
       |  CAST(9 * n_docs - s_sum AS BIGINT) AS do_num,
       |  CAST(c0 * (3 * n_docs - c0) + c1 * (3 * n_docs - c1)
       |       + c2 * (3 * n_docs - c2) AS BIGINT) AS de_num,
       |  CASE WHEN c0 * (3 * n_docs - c0) + c1 * (3 * n_docs - c1)
       |            + c2 * (3 * n_docs - c2) = 0 THEN 0.0
       |       ELSE round(1.0 -
       |         (CAST(9 * n_docs - s_sum AS DOUBLE) / CAST(6 * n_docs AS DOUBLE))
       |         / (CAST(c0 * (3 * n_docs - c0) + c1 * (3 * n_docs - c1)
       |                 + c2 * (3 * n_docs - c2) AS DOUBLE)
       |            / CAST(3 * n_docs * (3 * n_docs - 1) AS DOUBLE)), 6) END AS alpha
       |FROM g""".stripMargin

  /** chrF2 replay: char n-grams (n = 1..6) via string slices over the
    * token concatenation, per-order e6 quantization, integer-DIV order
    * mean, F2 = 5PR/(4P+R) in micros — term-for-term Bleu.chrF.
    */
  private[graft] lazy val ChrFOracleSql: String =
    s"""WITH t AS (SELECT doc_id, source, $TokensSql AS toks FROM documents),
       |pr AS MATERIALIZED (
       |       SELECT a.doc_id AS pair_id, a.source,
       |              array_to_string(a.toks, '') AS cand,
       |              array_to_string(b.toks, '') AS ref
       |       FROM t a JOIN t b ON b.doc_id = a.doc_id + 1
       |       WHERE a.doc_id % 2 = 0),
       |ns AS (SELECT unnest([1, 2, 3, 4, 5, 6]) AS n),
       |cg AS (SELECT pair_id, n,
       |         unnest(list_transform(generate_series(1, len(cand) - n + 1),
       |                i -> cand[i:i+n-1])) AS g
       |       FROM pr CROSS JOIN ns),
       |rg AS (SELECT pair_id, n,
       |         unnest(list_transform(generate_series(1, len(ref) - n + 1),
       |                i -> ref[i:i+n-1])) AS g
       |       FROM pr CROSS JOIN ns),
       |cc AS (SELECT pair_id, n, g, CAST(count(*) AS BIGINT) AS c FROM cg GROUP BY 1, 2, 3),
       |rc AS (SELECT pair_id, n, g, CAST(count(*) AS BIGINT) AS r FROM rg GROUP BY 1, 2, 3),
       |mm AS (SELECT cc.pair_id, cc.n, CAST(sum(LEAST(cc.c, rc.r)) AS BIGINT) AS m
       |       FROM cc JOIN rc ON rc.pair_id = cc.pair_id AND rc.n = cc.n AND rc.g = cc.g
       |       GROUP BY 1, 2),
       |base AS (SELECT pair_id, source, n,
       |           CAST(GREATEST(len(cand) - n + 1, 0) AS BIGINT) AS tc,
       |           CAST(GREATEST(len(ref) - n + 1, 0) AS BIGINT) AS tr
       |         FROM pr CROSS JOIN ns),
       |pm AS (SELECT base.pair_id, base.source, base.tc, base.tr,
       |         coalesce(mm.m, 0) AS m
       |       FROM base LEFT JOIN mm ON mm.pair_id = base.pair_id AND mm.n = base.n),
       |po AS (SELECT pair_id, source,
       |         CAST(floor(CASE WHEN tc > 0 THEN CAST(m AS DOUBLE) / CAST(tc AS DOUBLE)
       |                         ELSE 0.0 END * 1000000.0 + 0.5) AS BIGINT) AS p_micros,
       |         CAST(floor(CASE WHEN tr > 0 THEN CAST(m AS DOUBLE) / CAST(tr AS DOUBLE)
       |                         ELSE 0.0 END * 1000000.0 + 0.5) AS BIGINT) AS r_micros
       |       FROM pm),
       |pp AS (SELECT pair_id, source,
       |         CAST(sum(p_micros) AS BIGINT) // 6 AS pm6,
       |         CAST(sum(r_micros) AS BIGINT) // 6 AS rm6
       |       FROM po GROUP BY 1, 2),
       |pf AS (SELECT source, pm6, rm6,
       |         CASE WHEN pm6 + rm6 = 0 THEN 0
       |              ELSE CAST(floor(5.0 * CAST(pm6 AS DOUBLE) * CAST(rm6 AS DOUBLE)
       |                     / (4.0 * CAST(pm6 AS DOUBLE) + CAST(rm6 AS DOUBLE)) + 0.5)
       |                   AS BIGINT) END AS f_micros
       |       FROM pp)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_pairs,
       |       round(CAST(sum(pm6) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1000000.0, 6) AS avg_chrp,
       |       round(CAST(sum(rm6) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1000000.0, 6) AS avg_chrr,
       |       round(CAST(sum(f_micros) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1000000.0, 6) AS avg_chrf2
       |FROM pf GROUP BY 1""".stripMargin

  /** pass@k replay: per-user (n, c), the telescoped product unrolled per
    * literal k in the same left-associated factor order as
    * PassAtK.estimateCol, e6 micros before the mean.
    */
  private[graft] lazy val PassAtKOracleSql: String = {
    val branches = PassAtKKs.map { k =>
      val prod = (0 until k)
        .map(i => s"(CAST(n - c - $i AS DOUBLE) / CAST(n - $i AS DOUBLE))")
        .reduce((a, b) => s"$a * $b")
      s"""(SELECT CAST($k AS INT) AS k,
         |        CAST(count(*) AS BIGINT) AS n_tasks,
         |        CASE WHEN count(*) = 0 THEN 0.0
         |             ELSE round(CAST(sum(pm) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         |                        / 1000000.0, 6) END AS avg_pass
         | FROM (SELECT CAST(floor(
         |         (CASE WHEN n - c < $k THEN 1.0 ELSE 1.0 - $prod END)
         |         * 1000000.0 + 0.5) AS BIGINT) AS pm
         |       FROM tc WHERE n >= $k))""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH tc AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
       |              CAST(sum(CASE WHEN event_type = '${graft.operators.PassAtK.DefaultSuccessType}' THEN 1 ELSE 0 END)
       |                   AS BIGINT) AS c
       |            FROM events GROUP BY 1)
       |$branches""".stripMargin
  }

  /** One SQL branch per k — BY REFERENCE to the operator's constant, so
    * oracle and operator cannot disagree (r18 ADVICE). */
  private[graft] val PassAtKKs: Seq[Int] = graft.operators.PassAtK.DefaultKs
}
