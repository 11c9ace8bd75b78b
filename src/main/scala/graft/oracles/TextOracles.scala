package graft.oracles

import graft.functions.Money
import graft.operators.RepetitionCoverage
import graft.oracles.SharedCtes._

/** Generated DuckDB oracle replays: text/tokenizer family (LM
  * scores, Gopher gates, curation ledger, BPE/byte-BPE/WordPiece/
  * UnigramLM, near-dup signatures, similarity join).
  *
  * Moved verbatim out of SparkEntry.scala (r18 split); the
  * `SparkEntry.oracleSql` map keeps every `"q..." ->` key and
  * references these by name.
  */
private[graft] object TextOracles {

  /** Shared by q_decontaminate and q_decontaminate_bloom (identical output
    * by construction — the Bloom prefilter is exact after verification).
    */
  private[graft] lazy val DecontaminateSql: String =
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
       |be AS (SELECT doc_id AS bench_id, unnest(sh) AS s FROM d WHERE doc_id % 20 = 0)
       |SELECT tr.doc_id, be.bench_id, count(*) AS n_shared
       |FROM tr JOIN be USING (s)
       |GROUP BY tr.doc_id, be.bench_id
       |HAVING count(*) >= 2""".stripMargin

  // bigram-LM per-doc scores — shared by q_lm_score and nested (derived
  // table) by the DoReMi oracle so the loss contract cannot drift
  private[graft] lazy val LmScoreOracleSql: String =
    s"""WITH t AS (SELECT doc_id, $TokensSql AS toks FROM documents),
       |pos AS (
       |  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
       |                 i -> toks[i] || ' ' || toks[i + 1])) AS b
       |  FROM t),
       |uni AS (SELECT w, count(*) AS cu
       |        FROM (SELECT unnest(toks) AS w FROM t) GROUP BY w),
       |bi AS (SELECT b, count(*) AS cb FROM pos GROUP BY b),
       |v AS (SELECT count(DISTINCT w) AS v
       |      FROM (SELECT unnest(toks) AS w FROM t))
       |SELECT pos.doc_id, count(*) AS n_bigrams,
       |       round(avg(ln((bi.cb + 1.0) / (uni.cu + 1.0 * v.v))), 6) AS avg_logp
       |FROM pos JOIN bi USING (b)
       |         JOIN uni ON uni.w = split_part(pos.b, ' ', 1)
       |         CROSS JOIN v
       |GROUP BY pos.doc_id""".stripMargin

  // DoReMi domain weights: nested LM-loss oracle, exact integer-micro
  // domain sums, quantized excess → 16-squaring pexp replay, sqrt
  // temperature baseline, e6-quantized weights summed exactly, one
  // fixed-spelling smoothed normalization (floor-6)
  private[graft] lazy val DoremiOracleSql: String = {
    val squarings = (1 to 16)
      .map(i => s"p$i AS (SELECT *, e${i - 1} * e${i - 1} AS e$i FROM p${i - 1})")
      .mkString(",\n")
    s"""WITH lmq AS (SELECT * FROM ($LmScoreOracleSql) z),
       |dl AS (SELECT doc_id,
       |         -CAST(round(avg_logp * 1000000.0) AS BIGINT) AS loss_e6
       |       FROM lmq),
       |ds AS (SELECT d.source, count(*) AS n_docs,
       |         CAST(sum(l.loss_e6) AS BIGINT) AS sum_loss_e6
       |       FROM documents d JOIN dl l USING (doc_id) GROUP BY d.source),
       |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS tn,
       |          CAST(sum(sum_loss_e6) AS BIGINT) AS ts, count(*) AS k
       |        FROM ds),
       |ex AS (SELECT ds.source, ds.n_docs, ds.sum_loss_e6, tot.tn, tot.k,
       |        CAST(floor(greatest(0.0,
       |             CAST(ds.sum_loss_e6 AS DOUBLE) / CAST(ds.n_docs AS DOUBLE)
       |             - CAST(tot.ts AS DOUBLE) / CAST(tot.tn AS DOUBLE))
       |             + 0.5) AS BIGINT) AS excess_e6
       |       FROM ds CROSS JOIN tot),
       |p0 AS (SELECT *,
       |         1.0 + (CAST(excess_e6 AS DOUBLE) / 1000000.0) / 65536.0 AS e0
       |       FROM ex),
       |$squarings,
       |w AS (SELECT source, n_docs, sum_loss_e6, excess_e6, k,
       |        CAST(floor(sqrt(CAST(n_docs AS DOUBLE) / CAST(tn AS DOUBLE))
       |             * e16 * 1000000.0 + 0.5) AS BIGINT) AS w_e6
       |      FROM p16),
       |tw AS (SELECT CAST(sum(w_e6) AS BIGINT) AS tot_w FROM w)
       |SELECT source, n_docs, sum_loss_e6, excess_e6, w_e6,
       |  floor((0.99 * CAST(w_e6 AS DOUBLE) / CAST(tot_w AS DOUBLE)
       |         + 0.01 / CAST(k AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
       |    AS weight
       |FROM w CROSS JOIN tw""".stripMargin
  }

  /** Generated replay of Doremi.epochWeights (3 epochs): per-source mean
    * loss quantized once, then each epoch is a pure-integer baseline
    * `(Σ α_e6·m_e6 + 5·10⁵) // 10⁶`, an integer excess max, a 16-squaring
    * pseudo-exp chain, and the e6-requantized α — the same unrolled
    * trajectory the driver loop walks.
    */
  private[graft] lazy val DoremiEpochsOracleSql: String = {
    val R = 3
    def epoch(t: Int): String = {
      val squarings = (1 to 16)
        .map(i => s"q${t}_$i AS (SELECT *, e${i - 1} * e${i - 1} AS e$i FROM q${t}_${i - 1})")
        .mkString(",\n")
      s"""bl$t AS (SELECT CAST((sum(a_e6 * m_e6) + 500000) // 1000000 AS BIGINT) AS b
         |         FROM aw${t - 1}),
         |ex$t AS (SELECT aw.source, aw.n_docs, aw.m_e6, aw.tn, aw.k,
         |           GREATEST(aw.m_e6 - bl.b, 0) AS excess
         |         FROM aw${t - 1} aw CROSS JOIN bl$t bl),
         |q${t}_0 AS (SELECT *,
         |           1.0 + (CAST(excess AS DOUBLE) / 1000000.0) / 65536.0 AS e0
         |         FROM ex$t),
         |$squarings,
         |w$t AS (SELECT source, n_docs, m_e6, tn, k,
         |          CAST(floor(sqrt(CAST(n_docs AS DOUBLE) / CAST(tn AS DOUBLE))
         |               * e16 * 1000000.0 + 0.5) AS BIGINT) AS w_e6
         |        FROM q${t}_16),
         |tw$t AS (SELECT CAST(sum(w_e6) AS BIGINT) AS tw FROM w$t),
         |aw$t AS (SELECT source, n_docs, m_e6, tn, k,
         |           CAST(floor((0.99 * CAST(w_e6 AS DOUBLE) / CAST(tw.tw AS DOUBLE)
         |                + 0.01 / CAST(k AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS a_e6
         |         FROM w$t CROSS JOIN tw$t tw)""".stripMargin
    }
    val out = (1 to R)
      .map(t => s"SELECT source, n_docs, m_e6 AS m_loss_e6, CAST($t AS INT) AS epoch, a_e6 FROM aw$t")
      .mkString("\nUNION ALL\n")
    s"""WITH lmq AS (SELECT * FROM ($LmScoreOracleSql) z),
       |dl AS (SELECT doc_id,
       |         -CAST(round(avg_logp * 1000000.0) AS BIGINT) AS loss_e6
       |       FROM lmq),
       |ds AS (SELECT d.source, count(*) AS n_docs,
       |         CAST(sum(l.loss_e6) AS BIGINT) AS sum_loss_e6
       |       FROM documents d JOIN dl l USING (doc_id) GROUP BY d.source),
       |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS tn, count(*) AS k FROM ds),
       |aw0 AS (SELECT ds.source, ds.n_docs,
       |          CAST(floor(CAST(ds.sum_loss_e6 AS DOUBLE)
       |               / CAST(ds.n_docs AS DOUBLE) + 0.5) AS BIGINT) AS m_e6,
       |          tot.tn, tot.k, CAST(1000000 // tot.k AS BIGINT) AS a_e6
       |        FROM ds CROSS JOIN tot),
       |${(1 to R).map(epoch).mkString(",\n")}
       |$out""".stripMargin
  }

  private[graft] lazy val CurationLedgerOracleSql: String =
      s"""WITH gq AS (SELECT doc_id, keep FROM ($GopherGatesOracleSql) gqx),
         |gr AS (SELECT doc_id, keep FROM ($GopherRepetitionOracleSql) grx),
         |cont AS (SELECT DISTINCT doc_id FROM ($DecontaminateSql) cx),
         |dupx AS (SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 20 <> 0),
         |dmin AS (SELECT h, min(doc_id) AS keeper FROM dupx GROUP BY h)
         |SELECT d.doc_id,
         |       (d.doc_id % 20 = 0) AS is_bench,
         |       gq.keep AS g_quality,
         |       gr.keep AS g_repetition,
         |       coalesce(dx.doc_id <> dm.keeper, FALSE) AS is_exact_dup,
         |       (cont.doc_id IS NOT NULL) AS is_contaminated,
         |       ((d.doc_id % 20 <> 0) AND gq.keep AND gr.keep
         |        AND coalesce(dx.doc_id = dm.keeper, TRUE)
         |        AND cont.doc_id IS NULL) AS keep
         |FROM documents d
         |JOIN gq USING (doc_id)
         |JOIN gr USING (doc_id)
         |LEFT JOIN dupx dx ON dx.doc_id = d.doc_id
         |LEFT JOIN dmin dm ON dm.h = dx.h
         |LEFT JOIN cont ON cont.doc_id = d.doc_id""".stripMargin

  private[graft] lazy val GopherGatesOracleSql: String =
      s"""WITH t AS (SELECT doc_id, text, $TokensSql AS toks FROM documents),
         |m AS (
         |  SELECT doc_id,
         |         CAST(len(toks) AS BIGINT) AS n_words,
         |         CAST(coalesce(list_sum(list_transform(toks, x -> len(x))), 0) AS BIGINT) AS sum_len,
         |         CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS n_alpha,
         |         CAST((length(text) - length(translate(text, '#', '')))
         |            + (length(text) - length(translate(text, '…', ''))) AS BIGINT) AS n_sym,
         |         CAST(len(list_filter(['the','be','to','of','and','that','have','with'],
         |                              s -> list_contains(toks, s))) AS BIGINT) AS n_stop
         |  FROM t),
         |g AS (
         |  SELECT doc_id, n_words,
         |         (n_words BETWEEN 50 AND 100000) AS g_word_count,
         |         (3 * n_words <= sum_len AND sum_len <= 10 * n_words) AS g_word_len,
         |         (10 * n_sym <= n_words) AS g_symbol,
         |         (5 * n_alpha >= 4 * n_words) AS g_alpha,
         |         (n_stop >= 2) AS g_stop
         |  FROM m),
         |k AS (
         |  SELECT *,
         |         CAST((CASE WHEN g_word_count THEN 0 ELSE 1 END)
         |            + (CASE WHEN g_word_len THEN 0 ELSE 2 END)
         |            + (CASE WHEN g_symbol THEN 0 ELSE 4 END)
         |            + (CASE WHEN g_alpha THEN 0 ELSE 8 END)
         |            + (CASE WHEN g_stop THEN 0 ELSE 16 END) AS BIGINT) AS reject_mask
         |  FROM g)
         |SELECT doc_id, n_words, g_word_count, g_word_len, g_symbol, g_alpha,
         |       g_stop, reject_mask, (reject_mask = 0) AS keep
         |FROM k""".stripMargin

  private[graft] lazy val GopherRepetitionOracleSql: String = {
      val topDefs = RepetitionCoverage.TopThresholds
      val dupDefs = RepetitionCoverage.DupThresholds
      val nsValues = (topDefs ++ dupDefs).map { case (n, _) => s"($n)" }.mkString(",")
      val joins =
        topDefs.map { case (n, _) =>
          s"LEFT JOIN topg t$n ON t$n.doc_id = b.doc_id AND t$n.n = $n"
        } ++ dupDefs.map { case (n, _) =>
          s"LEFT JOIN covsum c$n ON c$n.doc_id = b.doc_id AND c$n.n = $n"
        }
      val covCols =
        topDefs.map { case (n, _) => s"coalesce(t$n.covered, 0) AS cov_t$n" } ++
          dupDefs.map { case (n, _) => s"coalesce(c$n.covered, 0) AS cov_d$n" }
      def fracSql(cov: String, out: String) =
        s"""CAST(CASE WHEN sum_len = 0 THEN 0
           |     ELSE floor(CAST($cov AS DOUBLE) / CAST(sum_len AS DOUBLE)
           |                * 1000000.0 + 0.5) / 1000000.0 END AS DOUBLE) AS $out"""
          .stripMargin
      val fracs =
        topDefs.map { case (n, _) => fracSql(s"cov_t$n", s"top${n}_char_frac") } ++
          dupDefs.map { case (n, _) => fracSql(s"cov_d$n", s"dup${n}_char_frac") }
      val maskTerms = (topDefs.map { case (n, t) => (s"cov_t$n", t) } ++
        dupDefs.map { case (n, t) => (s"cov_d$n", t) }).zipWithIndex.map {
        case ((cov, t), i) =>
          s"(CASE WHEN $cov * 100 <= $t * sum_len THEN 0 ELSE ${1L << i} END)"
      }.mkString("\n       + ")
      s"""WITH t AS (SELECT doc_id, $TokensSql AS toks FROM documents),
         |base AS (
         |  SELECT doc_id, toks, len(toks) AS n_tok,
         |         CAST(coalesce(list_sum(list_transform(toks, x -> len(x))), 0)
         |              AS BIGINT) AS sum_len
         |  FROM t),
         |ns(n) AS (VALUES $nsValues),
         |starts AS (
         |  SELECT doc_id, n, toks,
         |         unnest(range(1, n_tok - n + 2)) AS j
         |  FROM base CROSS JOIN ns
         |  WHERE n_tok >= n),
         |grams AS (
         |  SELECT doc_id, n, CAST(j AS BIGINT) AS j,
         |         array_to_string(list_slice(toks, j, j + n - 1), ' ') AS gram
         |  FROM starts),
         |gc AS (
         |  SELECT doc_id, n, gram, count(*) AS c
         |  FROM grams GROUP BY doc_id, n, gram),
         |topg AS (
         |  SELECT doc_id, n, CAST(c * (len(gram) - (n - 1)) AS BIGINT) AS covered
         |  FROM (SELECT doc_id, n, gram, c,
         |               row_number() OVER (PARTITION BY doc_id, n
         |                                  ORDER BY c DESC, gram ASC) AS rn
         |        FROM gc)
         |  WHERE rn = 1 AND n <= 4),
         |dstart AS (
         |  SELECT g.doc_id, g.n, g.j
         |  FROM grams g JOIN gc USING (doc_id, n, gram)
         |  WHERE gc.c >= 2 AND g.n >= 5),
         |covpos AS (
         |  SELECT DISTINCT doc_id, n, j + o AS p
         |  FROM (SELECT doc_id, n, j, unnest(range(0, n)) AS o FROM dstart)),
         |covsum AS (
         |  SELECT cp.doc_id, cp.n,
         |         CAST(sum(len(list_extract(b.toks, cp.p))) AS BIGINT) AS covered
         |  FROM covpos cp JOIN base b USING (doc_id)
         |  GROUP BY cp.doc_id, cp.n),
         |wide AS (
         |  SELECT b.doc_id, CAST(b.n_tok AS BIGINT) AS n_words, b.sum_len,
         |         ${covCols.mkString(",\n         ")}
         |  FROM base b
         |  ${joins.mkString("\n  ")})
         |SELECT doc_id, n_words, sum_len,
         |       ${fracs.mkString(",\n       ")},
         |       CAST($maskTerms AS BIGINT) AS reject_mask,
         |       (($maskTerms) = 0) AS keep
         |FROM wide""".stripMargin
  }

  /** Generated DuckDB replay of TF.simhash48FromHashes: one md5-48 per
    * token, 48 independent ±1 position sums (sign of each = one output
    * bit). All integers; empty docs sign to 0 everywhere → signature 0.
    */
  private[graft] lazy val SimhashMd5OracleSql: String = {
    val bitSums = (0 until 48).map(j =>
      s"coalesce(list_sum(list_transform(hs, h -> CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END)), 0) AS c$j")
      .mkString(",\n         ")
    val sig = (0 until 48).map(j =>
      s"(CASE WHEN c$j > 0 THEN ${1L << j} ELSE 0 END)").mkString("\n       + ")
    s"""WITH t AS (
       |  SELECT doc_id, list_transform($TokensSql, tok ->
       |    ('0x' || substring(md5(tok), 1, 12))::BIGINT) AS hs
       |  FROM documents
       |), c AS (
       |  SELECT doc_id,
       |         $bitSums
       |  FROM t
       |)
       |SELECT doc_id,
       |       CAST($sig AS BIGINT) AS simhash48
       |FROM c""".stripMargin
  }

  /** Generated DuckDB replay of TF.minhash48Lanes over TF.shingles3: lane
    * i = min over distinct 3-shingles of md5-48("i <shingle>"); docs
    * shorter than 3 tokens shingle to their whole text.
    */
  private[graft] lazy val MinhashMd5OracleSql: String = {
    val lanes = (0 until 16).map(i =>
      s"list_min(list_transform(sh, s -> ('0x' || substring(md5('$i ' || s), 1, 12))::BIGINT)) AS mh$i")
      .mkString(",\n       ")
    s"""WITH t AS (SELECT doc_id, $TokensSql AS toks FROM documents),
       |sg AS (
       |  SELECT doc_id,
       |         CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
       |              ELSE list_distinct(list_transform(
       |                     generate_series(1, len(toks) - 2),
       |                     i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))
       |         END AS sh
       |  FROM t)
       |SELECT doc_id,
       |       $lanes
       |FROM sg""".stripMargin
  }

  /** Generated DuckDB replay of Dedup.minhashPairsMd5: md5-48 lanes over
    * distinct 3-shingles (the MinhashMd5OracleSql sketch), 4 bands of 4
    * exact lane values comma-joined as the band key, bucket cap 10000,
    * candidates verified with exact shingle-set Jaccard ≥ 0.05. sg/cand
    * are MATERIALIZED (each is referenced more than once — the plain-CTE
    * inlining gotcha).
    */
  private[graft] lazy val MinhashMd5PairsOracleSql: String = {
    val lanes = (0 until 16).map(i =>
      s"list_min(list_transform(sh, s -> ('0x' || substring(md5('$i ' || s), 1, 12))::BIGINT)) AS mh$i")
      .mkString(",\n       ")
    val bandRows = (0 until 4).map { b =>
      val cols = (0 until 4).map(j => s"mh${b * 4 + j}").mkString(", ")
      s"SELECT doc_id, $b AS band, concat_ws(',', $cols) AS key FROM sig"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH t AS (SELECT doc_id, $TokensSql AS toks FROM documents),
       |sg AS MATERIALIZED (
       |  SELECT doc_id,
       |         CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
       |              ELSE list_distinct(list_transform(
       |                     generate_series(1, len(toks) - 2),
       |                     i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))
       |         END AS sh
       |  FROM t),
       |sig AS (
       |  SELECT doc_id,
       |       $lanes
       |  FROM sg),
       |e AS (
       |  $bandRows),
       |b AS MATERIALIZED (
       |  SELECT doc_id, band, key FROM (
       |    SELECT doc_id, band, key, count(*) OVER (PARTITION BY band, key) AS bn
       |    FROM e)
       |  WHERE bn <= 10000),
       |cand AS MATERIALIZED (
       |  SELECT DISTINCT a.doc_id AS id1, b2.doc_id AS id2
       |  FROM b a JOIN b b2 ON a.band = b2.band AND a.key = b2.key
       |                    AND b2.doc_id > a.doc_id),
       |v AS (
       |  SELECT id1, id2,
       |         CASE WHEN len(list_distinct(list_concat(sa.sh, sb.sh))) = 0 THEN 0.0
       |              ELSE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
       |                   / len(list_distinct(list_concat(sa.sh, sb.sh)))
       |         END AS jaccard
       |  FROM cand
       |  JOIN sg sa ON sa.doc_id = cand.id1
       |  JOIN sg sb ON sb.doc_id = cand.id2)
       |SELECT id1, id2, jaccard FROM v
       |WHERE jaccard >= CAST(0.05 AS DOUBLE)""".stripMargin
  }

  /** Generated DuckDB replay of Dedup.simhashPairsMd5: the 48-bit md5
    * SimHash (SimhashMd5OracleSql's signature), 4×12-bit chunk buckets
    * (cap 10000), exact Hamming ≤ 3 — complete recall by pigeonhole, so
    * both engines compute the identical pair set.
    */
  private[graft] lazy val SimhashMd5PairsOracleSql: String = {
    val bitSums = (0 until 48).map(j =>
      s"coalesce(list_sum(list_transform(hs, h -> CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END)), 0) AS c$j")
      .mkString(",\n         ")
    val sig = (0 until 48).map(j =>
      s"(CASE WHEN c$j > 0 THEN ${1L << j} ELSE 0 END)").mkString("\n       + ")
    s"""WITH t AS (
       |  SELECT doc_id, list_transform($TokensSql, tok ->
       |    ('0x' || substring(md5(tok), 1, 12))::BIGINT) AS hs
       |  FROM documents
       |), c AS (
       |  SELECT doc_id,
       |         $bitSums
       |  FROM t
       |), s AS (
       |  SELECT doc_id, CAST($sig AS BIGINT) AS sig FROM c
       |), ch AS MATERIALIZED (
       |  SELECT doc_id, sig, ci, (sig >> (ci * 12)) & 4095 AS cv
       |  FROM s, (SELECT unnest(range(0, 4)) AS ci)
       |), b AS MATERIALIZED (
       |  SELECT doc_id, sig, ci, cv FROM (
       |    SELECT doc_id, sig, ci, cv, count(*) OVER (PARTITION BY ci, cv) AS bn
       |    FROM ch)
       |  WHERE bn <= 10000
       |), h AS (
       |  SELECT a.doc_id AS id1, b2.doc_id AS id2,
       |         CAST(bit_count(xor(a.sig, b2.sig)) AS INTEGER) AS hamming
       |  FROM b a JOIN b b2 ON a.ci = b2.ci AND a.cv = b2.cv
       |                    AND b2.doc_id > a.doc_id)
       |SELECT id1, id2, CAST(min(hamming) AS INTEGER) AS hamming
       |FROM h WHERE hamming <= 3
       |GROUP BY id1, id2""".stripMargin
  }

  /** Shared CTE prefix for the exact-substring oracles: rolling 8-token
    * window hashes, hashes in ≥2 distinct docs, and the merged maximal
    * spans (overlapping-or-adjacent windows coalesce).
    */
  private[graft] val SubstrSpansSql: String =
    s"""WITH t AS (SELECT doc_id, $TokensSql AS toks FROM documents),
       |wh AS (
       |  SELECT doc_id, pos, md5(array_to_string(toks[(pos+1):(pos+8)], ' ')) AS h
       |  FROM (SELECT doc_id, toks, unnest(generate_series(0, len(toks)-8)) AS pos
       |        FROM t WHERE len(toks) >= 8)),
       |dup AS (SELECT h FROM wh GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
       |dw AS (SELECT wh.doc_id, wh.pos FROM wh JOIN dup USING (h)),
       |fl AS (
       |  SELECT doc_id, pos,
       |         CASE WHEN pos > coalesce(max(pos + 7) OVER (PARTITION BY doc_id ORDER BY pos
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -2) + 1
       |              THEN 1 ELSE 0 END AS ns
       |  FROM dw),
       |isl AS (
       |  SELECT doc_id, pos,
       |         sum(ns) OVER (PARTITION BY doc_id ORDER BY pos
       |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
       |  FROM fl),
       |spans AS (
       |  SELECT doc_id, min(pos) AS span_start, max(pos) + 7 AS span_end,
       |         CAST(count(*) AS BIGINT) AS n_windows
       |  FROM isl GROUP BY doc_id, g)""".stripMargin

  /** Generated replay of [[graft.operators.LengthBuckets.optimalBuckets]]
    * (b = 4): the DP unrolled layer-per-CTE — each layer is an argmin join
    * over the histogram (row_number by (cost, i) ≡ the driver loop's
    * strict-< smallest-i tie), then the backtrack walks best-i pointers
    * from the last layer and the bucket stats come off the prefix sums.
    */
  private[graft] lazy val LengthBucketsOracleSql: String = {
    val layers = (2 to 4).map { b =>
      s"""c$b AS MATERIALIZED (SELECT j, cost, bi FROM (
         |  SELECT jn.k AS j,
         |         p.cost + jn.l * (jn.cc - i.cc) - (jn.ss - i.ss) AS cost, i.k AS bi,
         |         row_number() OVER (PARTITION BY jn.k
         |           ORDER BY p.cost + jn.l * (jn.cc - i.cc) - (jn.ss - i.ss), i.k) AS rn
         |  FROM h jn JOIN h i ON i.k < jn.k JOIN c${b - 1} p ON p.j = i.k)
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH lens AS (SELECT CAST(len($TokensSql) AS BIGINT) AS l FROM documents),
       |hist AS (SELECT l, CAST(count(*) AS BIGINT) AS c FROM lens GROUP BY l),
       |h AS MATERIALIZED (
       |  SELECT CAST(row_number() OVER (ORDER BY l) AS INT) AS k, l,
       |         CAST(sum(c) OVER (ORDER BY l) AS BIGINT) AS cc,
       |         CAST(sum(c * l) OVER (ORDER BY l) AS BIGINT) AS ss
       |  FROM hist),
       |h0 AS (SELECT 0 AS k, CAST(0 AS BIGINT) AS l, CAST(0 AS BIGINT) AS cc,
       |              CAST(0 AS BIGINT) AS ss
       |       UNION ALL SELECT k, l, cc, ss FROM h),
       |c1 AS MATERIALIZED (SELECT k AS j, l * cc - ss AS cost, 0 AS bi FROM h),
       |$layers,
       |nn AS (SELECT max(k) AS n FROM h),
       |s4 AS (SELECT c4.bi AS j FROM c4 JOIN nn ON c4.j = nn.n),
       |s3 AS (SELECT c3.bi AS j FROM c3 JOIN s4 ON c3.j = s4.j),
       |s2 AS (SELECT c2.bi AS j FROM c2 JOIN s3 ON c2.j = s3.j),
       |bounds AS (
       |  SELECT 1 AS b, 0 AS lo_k, (SELECT j FROM s2) AS hi_k
       |  UNION ALL SELECT 2, (SELECT j FROM s2), (SELECT j FROM s3)
       |  UNION ALL SELECT 3, (SELECT j FROM s3), (SELECT j FROM s4)
       |  UNION ALL SELECT 4, (SELECT j FROM s4), (SELECT n FROM nn))
       |SELECT CAST(bounds.b AS INT) AS bucket_id, hi.l AS hi_len,
       |       hi.cc - lo.cc AS n_docs, hi.ss - lo.ss AS n_tokens,
       |       hi.l * (hi.cc - lo.cc) - (hi.ss - lo.ss) AS padding
       |FROM bounds
       |JOIN h0 lo ON lo.k = bounds.lo_k
       |JOIN h0 hi ON hi.k = bounds.hi_k""".stripMargin
  }

  /** PPJoin exact-Jaccard self-join replay (also embedded by the
    * q_dedup_method_overlap audit). */
  private[graft] lazy val SimilarityJoinOracleSql: String =
    s"""WITH t AS (
         |  SELECT doc_id, $TokensSql AS toks FROM documents
         |), d AS (
         |  SELECT doc_id, list_distinct(
         |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
         |         ELSE list_transform(generate_series(1, len(toks) - 2),
         |                             i -> array_to_string(toks[i:i+2], ' '))
         |    END) AS sh
         |  FROM t
         |), sz AS (
         |  SELECT doc_id, len(sh) AS n FROM d
         |), ex AS (
         |  SELECT doc_id, unnest(sh) AS s FROM d
         |), dfq AS (
         |  SELECT s, count(*) AS df FROM ex GROUP BY s
         |), rk AS (
         |  SELECT ex.doc_id, ex.s,
         |         row_number() OVER (PARTITION BY ex.doc_id
         |                            ORDER BY dfq.df, ex.s) AS rn
         |  FROM ex JOIN dfq ON ex.s = dfq.s
         |), pref AS (
         |  SELECT rk.doc_id, rk.s, sz.n
         |  FROM rk JOIN sz ON rk.doc_id = sz.doc_id
         |  WHERE rk.rn <= sz.n - CAST(ceil(CAST(0.6 AS DOUBLE) * sz.n) AS BIGINT) + 1
         |), cand AS (
         |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         |  FROM pref a JOIN pref b
         |    ON a.s = b.s AND b.doc_id > a.doc_id
         |   AND b.n >= CAST(0.6 AS DOUBLE) * a.n - CAST(1e-9 AS DOUBLE)
         |   AND b.n <= a.n / CAST(0.6 AS DOUBLE) + CAST(1e-9 AS DOUBLE)
         |), v AS (
         |  SELECT c.id1, c.id2,
         |         CAST(len(list_intersect(d1.sh, d2.sh)) AS DOUBLE)
         |         / (len(d1.sh) + len(d2.sh) - len(list_intersect(d1.sh, d2.sh)))
         |           AS jaccard
         |  FROM cand c
         |  JOIN d d1 ON c.id1 = d1.doc_id
         |  JOIN d d2 ON c.id2 = d2.doc_id)
         |SELECT id1, id2, jaccard FROM v
         |WHERE jaccard >= CAST(0.6 AS DOUBLE)""".stripMargin

  /** LSH banding tuner replay: the S-curve with UNROLLED multiplication
    * chains (left-assoc, matching the Column fold — never libm pow), over
    * the q_jaccard_adjacent similarity sample; per-pair e6 quantization
    * before exact BIGINT sums.
    */
  private[graft] lazy val LshTuningOracleSql: String = {
    def pw(x: String, n: Int): String = Seq.fill(n)(x).mkString("(", " * ", ")")
    val rows = Seq((1, 16), (2, 8), (4, 4), (8, 2), (16, 1)).map { case (b, r) =>
      val p = s"(1.0 - ${pw(s"(1.0 - ${pw("j", r)})", b)})"
      s"""SELECT $b AS bands, $r AS rows, CAST(count(*) AS BIGINT) AS n_pairs,
         |       CAST(sum(CAST(floor($p * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
         |         AS exp_detected_e6,
         |       CAST(sum(CASE WHEN j >= 0.5
         |                     THEN 1000000 - CAST(floor($p * 1000000.0 + 0.5) AS BIGINT)
         |                     ELSE 0 END) AS BIGINT) AS exp_missed_above_tau_e6
         |FROM sims""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH d AS (SELECT doc_id, list_distinct($TokensSql) AS words FROM documents),
       |pp AS (SELECT a.doc_id AS id1, b.doc_id AS id2, a.words AS w1, b.words AS w2
       |       FROM d a JOIN d b ON b.doc_id = a.doc_id + 1),
       |sims AS (SELECT CASE WHEN len(list_distinct(list_concat(w1, w2))) = 0 THEN 0.0
       |                ELSE CAST(len(list_intersect(w1, w2)) AS DOUBLE)
       |                     / len(list_distinct(list_concat(w1, w2))) END AS j
       |         FROM pp)
       |$rows""".stripMargin
  }

  /** Generated DuckDB replay of UnigramLm.train (maxLen=12, maxPiece=4,
    * topV=500, rounds=2, minCount=2): ASCII word counts; char +
    * top-substring seed under (c DESC, piece); per-round forward DP
    * unrolled per end position (b tables contain REACHED positions only —
    * the reach check is the join), canonical path re-extraction by
    * repeated argmax (b DESC-sum ties to the smallest start, matching the
    * kernel's strict-max rule), exact BIGINT counts with char floors, and
    * the final prune + rescore. Every ln quantizes to micros before any
    * combination, so the hash match is structural.
    */
  /** Generated DuckDB replay of Bpe.trainMerges / subwordVocab (10 merges):
    * chars + `</w>` symbolization, per-round adjacent-pair counts (lateral
    * unnest over 1..len−1), argmax under (cnt DESC, l, r), and the merge
    * applied via plain `replace` over a DOUBLE-SPACE-separated encoding —
    * ` a  b ` → ` ab ` with single-space sentinels at both ends. Non-regex
    * `replace` is leftmost-first non-overlapping, exactly the native
    * PairMerge kernel's greedy contract, and symbols can never contain
    * spaces (words are whitespace-split tokens), so the encoding is
    * unambiguous. An exhausted pair table empties every later round's CTEs
    * structurally — the same early stop as the Scala loop. Every count is
    * an exact BIGINT: the hash match is structural.
    */
  private[graft] object BpeOracle {
    val R = 10

    /** One merge round over CTE names `v$r`/`top$r` — shared with
      * ByteBpeOracle (its v0 is the byte-mapped symbolization; the
      * double-space replay is safe there too because every mapped byte
      * char is non-space — 0x20 maps to U+0120).
      */
    def round(r: Int): String =
      s"""px$r AS MATERIALIZED (
         |  SELECT n, syms, unnest(range(1, len(syms))) AS i
         |  FROM v$r WHERE len(syms) >= 2),
         |pc$r AS MATERIALIZED (
         |  SELECT syms[i] AS l, syms[i + 1] AS r, CAST(sum(n) AS BIGINT) AS cnt
         |  FROM px$r GROUP BY 1, 2),
         |top$r AS MATERIALIZED (
         |  SELECT l, r, cnt FROM pc$r ORDER BY cnt DESC, l, r LIMIT 1),
         |v${r + 1} AS MATERIALIZED (
         |  SELECT v.word, v.n,
         |         string_split(trim(replace(' ' || array_to_string(v.syms, '  ') || ' ',
         |                                   ' ' || t.l || '  ' || t.r || ' ',
         |                                   ' ' || t.l || t.r || ' ')),
         |                      '  ') AS syms
         |  FROM v$r v CROSS JOIN top$r t)""".stripMargin

    lazy val ctes: String =
      s"""WITH tok AS (SELECT unnest($TokensSql) AS word FROM documents),
         |wc0 AS (SELECT word, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY word),
         |v0 AS MATERIALIZED (
         |  SELECT word, n,
         |         list_append(list_transform(range(1, len(word) + 1),
         |                                    i -> substr(word, i, 1)), '</w>') AS syms
         |  FROM wc0),
         |${(0 until R).map(round).mkString(",\n")}""".stripMargin

    lazy val mergesSql: String = {
      val union = (0 until R)
        .map(r => s"""SELECT CAST($r AS INT) AS merge_idx, l AS "left", r AS "right", cnt FROM top$r""")
        .mkString("\nUNION ALL\n")
      s"""$ctes
         |$union""".stripMargin
    }

    lazy val subwordsSql: String =
      s"""$ctes,
         |sw AS (SELECT s AS subword, CAST(sum(n) AS BIGINT) AS n_tokens
         |       FROM (SELECT n, unnest(syms) AS s FROM v$R)
         |       GROUP BY 1)
         |SELECT subword, n_tokens FROM sw
         |ORDER BY n_tokens DESC, subword LIMIT 30""".stripMargin

    /** Fertility under the learned merges — same formula as the unigram
      * twin, over the round-R vocab (syms length includes `</w>`).
      */
    lazy val fertilitySql: String =
      s"""$ctes,
         |ag AS (SELECT CAST(sum(n) AS BIGINT) AS n_words,
         |              CAST(sum(n * len(syms)) AS BIGINT) AS n_pieces,
         |              CAST(sum(n * len(word)) AS BIGINT) AS n_chars
         |       FROM v$R)
         |SELECT n_words, n_pieces, n_chars,
         |       n_pieces * 1000000 // n_words AS fertility_micros,
         |       n_chars * 1000000 // n_pieces AS chars_per_piece_micros
         |FROM ag""".stripMargin
  }

  /** Generated DuckDB replay of the byte-level BPE family
    * (operators.ByteBpe): symbolization replays from the hex dump of each
    * word's UTF-8 bytes through the 256-row byte→unicode VALUES table
    * (a driver-side constant, identical in both engines — the
    * q_cosine_neardup constant-shipping recipe); the merge rounds reuse
    * BpeOracle.round's double-space replay, which is safe on byte-mapped
    * symbols because every mapped char is non-space (0x20 → U+0120).
    */
  private[graft] object ByteBpeOracle {
    val R = 10

    private lazy val btVals: String =
      (0 until 256).map { b =>
        val c = graft.operators.ByteBpe.byteToChar(b).replace("'", "''")
        f"('$b%02X', '$c')"
      }.grouped(8).map(_.mkString(", ")).mkString(",\n  ")

    lazy val ctes: String =
      s"""WITH tok AS (SELECT unnest($TokensSql) AS word FROM documents),
         |wc0 AS (SELECT word, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY word),
         |bt AS MATERIALIZED (
         |  SELECT * FROM (VALUES
         |  $btVals) t(h, sym)),
         |bx AS (SELECT word, n,
         |              unnest(range(1, octet_length(encode(word)) + 1)) AS i
         |       FROM wc0),
         |bj AS (SELECT b.word, b.n, b.i, bt.sym
         |       FROM (SELECT word, n, i,
         |                    substr(hex(encode(word)), CAST(2 * i - 1 AS INT), 2) AS h
         |             FROM bx) b
         |       JOIN bt USING (h)),
         |v0 AS MATERIALIZED (
         |  SELECT word, n, list(sym ORDER BY i) AS syms FROM bj GROUP BY word, n),
         |${(0 until R).map(BpeOracle.round).mkString(",\n")}""".stripMargin

    lazy val mergesSql: String = {
      val union = (0 until R)
        .map(r => s"""SELECT CAST($r AS INT) AS merge_idx, l AS "left", r AS "right", cnt FROM top$r""")
        .mkString("\nUNION ALL\n")
      s"""$ctes
         |$union""".stripMargin
    }

    lazy val encodeSql: String =
      s"""$ctes,
         |sw AS (SELECT s AS subword, CAST(sum(n) AS BIGINT) AS n_tokens
         |       FROM (SELECT n, unnest(syms) AS s FROM v$R)
         |       GROUP BY 1)
         |SELECT subword, n_tokens FROM sw
         |ORDER BY n_tokens DESC, subword LIMIT 30""".stripMargin

    /** Fertility under the round-R vocab — pieces byte-denominated (no
      * `</w>`), n_chars raw characters like the other families.
      */
    lazy val fertilitySql: String =
      s"""$ctes,
         |ag AS (SELECT CAST(sum(n) AS BIGINT) AS n_words,
         |              CAST(sum(n * len(syms)) AS BIGINT) AS n_pieces,
         |              CAST(sum(n * len(word)) AS BIGINT) AS n_chars
         |       FROM v$R)
         |SELECT n_words, n_pieces, n_chars,
         |       n_pieces * 1000000 // n_words AS fertility_micros,
         |       n_chars * 1000000 // n_pieces AS chars_per_piece_micros
         |FROM ag""".stripMargin
  }

  /** Generated DuckDB replay of the WordPiece family (operators.WordPiece):
    * the frequency-substring vocab is one grouped candidate explosion + a
    * (c DESC, piece ASC) top-V, and the greedy longest-match-first encode
    * unrolls as ML layered argmax-by-length CTEs — each step advances every
    * still-unfinished word by its longest matching piece (row_number over
    * L DESC), exactly the native kernel's loop. The alphabet guarantee
    * (all single-char forms kept) means every training word finishes
    * within ML steps, so the unroll is complete, never truncated.
    */
  private[graft] object WordPieceOracle {
    val ML = 12; val MP = 4; val TOPV = 500

    /** word counts restricted to the WordPiece population (printable
      * ASCII ≤ ML chars, no '#'), the vocab, and the greedy segmentation
      * `wpseg(word, ord, piece)`.
      */
    private def stepCte(k: Int): String =
      s"""wg_$k AS MATERIALIZED (
         |  SELECT word, m, pos + L AS pos, piece FROM (
         |    SELECT w.word, w.m, w.pos, ll.L,
         |           CASE WHEN w.pos = 0 THEN substr(w.word, 1, ll.L)
         |                ELSE '##' || substr(w.word, w.pos + 1, ll.L) END AS piece,
         |           row_number() OVER (PARTITION BY w.word ORDER BY ll.L DESC) AS rn
         |    FROM wg_${k - 1} w
         |    CROSS JOIN range(1, ${MP + 1}) ll(L)
         |    JOIN wpv v ON v.piece = CASE WHEN w.pos = 0 THEN substr(w.word, 1, ll.L)
         |                                 ELSE '##' || substr(w.word, w.pos + 1, ll.L) END
         |    WHERE w.pos < w.m AND ll.L <= w.m - w.pos)
         |  WHERE rn = 1)""".stripMargin

    lazy val vocabCtes: String =
      s"""WITH tok AS (SELECT unnest($TokensSql) AS word FROM documents),
         |wc0 AS (SELECT word, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY word),
         |wpw AS MATERIALIZED (
         |  SELECT word, n, len(word) AS m FROM wc0
         |  WHERE regexp_matches(word, '^[\\x21-\\x22\\x24-\\x7e]{1,$ML}$$')),
         |wpc AS MATERIALIZED (
         |  SELECT CASE WHEN ii.i = 1 THEN substr(w.word, ii.i, ll.L)
         |              ELSE '##' || substr(w.word, ii.i, ll.L) END AS piece,
         |         CAST(sum(w.n) AS BIGINT) AS c
         |  FROM wpw w, range(1, ${ML + 1}) ii(i), range(1, ${MP + 1}) ll(L)
         |  WHERE ii.i <= w.m AND ll.L <= w.m - ii.i + 1
         |  GROUP BY 1),
         |wpv AS MATERIALIZED (
         |  SELECT piece, c FROM wpc
         |  WHERE len(piece) - CASE WHEN piece LIKE '##%' THEN 2 ELSE 0 END = 1
         |  UNION ALL
         |  SELECT piece, c FROM (
         |    SELECT piece, c FROM wpc
         |    WHERE len(piece) - CASE WHEN piece LIKE '##%' THEN 2 ELSE 0 END > 1
         |    ORDER BY c DESC, piece LIMIT $TOPV))""".stripMargin

    lazy val encodeCtes: String =
      s"""$vocabCtes,
         |wg_0 AS (SELECT word, m, 0 AS pos FROM wpw),
         |${(1 to ML).map(stepCte).mkString(",\n")},
         |wpseg AS (
         |  ${(1 to ML).map(k => s"SELECT word, $k AS ord, piece FROM wg_$k")
              .mkString("\n  UNION ALL\n  ")})""".stripMargin

    lazy val vocabSql: String =
      s"""$vocabCtes
         |SELECT piece, c FROM wpv""".stripMargin

    lazy val encodeSql: String =
      s"""$encodeCtes
         |SELECT s.piece AS subword, CAST(sum(w.n) AS BIGINT) AS n_tokens
         |FROM wpseg s JOIN wpw w USING (word) GROUP BY s.piece""".stripMargin

    lazy val fertilitySql: String =
      s"""$encodeCtes,
         |pw AS (SELECT word, CAST(count(*) AS BIGINT) AS np FROM wpseg GROUP BY word),
         |ag AS (SELECT CAST(sum(w.n) AS BIGINT) AS n_words,
         |              CAST(sum(w.n * p.np) AS BIGINT) AS n_pieces,
         |              CAST(sum(w.n * w.m) AS BIGINT) AS n_chars
         |       FROM wpw w JOIN pw p USING (word))
         |SELECT n_words, n_pieces, n_chars,
         |       n_pieces * 1000000 // n_words AS fertility_micros,
         |       n_chars * 1000000 // n_pieces AS chars_per_piece_micros
         |FROM ag""".stripMargin

    lazy val roundtripSql: String =
      s"""$encodeCtes,
         |rt AS (SELECT word,
         |              string_agg(CASE WHEN piece LIKE '##%' THEN substr(piece, 3)
         |                              ELSE piece END, '' ORDER BY ord) AS cat
         |       FROM wpseg GROUP BY word)
         |SELECT CAST(count(*) AS BIGINT) AS n_words,
         |       CAST(sum(CASE WHEN r.cat = w.word THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_roundtrip
         |FROM wpw w LEFT JOIN rt r USING (word)""".stripMargin
  }

  private[graft] object UnigramOracle {
    val ML = 12; val MP = 4; val R = 2; val TOPV = 500; val MINC = 2

    def vocabCte(name: String, raw: String): String =
      s"""$name AS MATERIALIZED (
         |  SELECT piece, c,
         |         CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
         |         - (SELECT CAST(floor(ln(CAST(sum(c) AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
         |            FROM $raw) AS sc
         |  FROM $raw)""".stripMargin

    /** Forward DP + canonical path extraction under `vocabName`, CTE names
      * suffixed `tag`; ends with `seg$tag(word, piece)`.
      */
    def segChain(tag: String, vocabName: String): String = {
      val cand =
        s"""cand$tag AS MATERIALIZED (
           |  SELECT w.word, w.m, ii.i, ll.L, v.piece, v.sc
           |  FROM words w, range(1, ${ML + 1}) ii(i), range(1, ${MP + 1}) ll(L), $vocabName v
           |  WHERE ii.i <= w.m AND ll.L <= ii.i
           |    AND v.piece = substr(w.word, ii.i - ll.L + 1, ll.L))""".stripMargin
      val b0 = s"bu${tag}_0 AS (SELECT word, 0 AS i, CAST(0 AS BIGINT) AS b FROM words)"
      val bs = (1 to ML).map { i =>
        s"""b${tag}_$i AS MATERIALIZED (
           |  SELECT c.word, max(p.b + c.sc) AS b
           |  FROM cand$tag c JOIN bu${tag}_${i - 1} p ON p.word = c.word AND p.i = c.i - c.L
           |  WHERE c.i = $i GROUP BY c.word),
           |bu${tag}_$i AS (SELECT * FROM bu${tag}_${i - 1}
           |              UNION ALL SELECT word, $i AS i, b FROM b${tag}_$i)""".stripMargin
      }.mkString(",\n")
      val e1 =
        s"""e${tag}_1 AS MATERIALIZED (
           |  SELECT word, j, piece FROM (
           |    SELECT c.word, c.i - c.L AS j, c.piece,
           |           row_number() OVER (PARTITION BY c.word
           |                              ORDER BY p.b + c.sc DESC, c.i - c.L ASC) AS rn
           |    FROM cand$tag c
           |    JOIN bu${tag}_$ML p ON p.word = c.word AND p.i = c.i - c.L
           |    WHERE c.i = c.m)
           |  WHERE rn = 1)""".stripMargin
      val es = (2 to ML).map { k =>
        s"""e${tag}_$k AS MATERIALIZED (
           |  SELECT word, j, piece FROM (
           |    SELECT c.word, c.i - c.L AS j, c.piece,
           |           row_number() OVER (PARTITION BY c.word
           |                              ORDER BY p.b + c.sc DESC, c.i - c.L ASC) AS rn
           |    FROM e${tag}_${k - 1} e
           |    JOIN cand$tag c ON c.word = e.word AND c.i = e.j
           |    JOIN bu${tag}_$ML p ON p.word = c.word AND p.i = c.i - c.L
           |    WHERE e.j > 0)
           |  WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
      val seg = s"seg$tag AS MATERIALIZED (\n  " +
        (1 to ML).map(k => s"SELECT word, piece FROM e${tag}_$k")
          .mkString("\n  UNION ALL\n  ") + ")"
      Seq(cand, b0, bs, e1, es, seg).mkString(",\n")
    }

    private def roundCtes(r: Int): String = {
      val cnt =
        s"""cnt$r AS MATERIALIZED (
           |  SELECT s.piece, CAST(sum(w.n) AS BIGINT) AS c
           |  FROM seg$r s JOIN words w USING (word) GROUP BY s.piece)""".stripMargin
      val vraw =
        s"""v${r + 1}raw AS MATERIALIZED (
           |  SELECT piece, c FROM cnt$r WHERE len(piece) > 1
           |  UNION ALL
           |  SELECT ch.piece,
           |         GREATEST(COALESCE(c.c, CAST(0 AS BIGINT)), CAST(1 AS BIGINT)) AS c
           |  FROM ch LEFT JOIN cnt$r c ON c.piece = ch.piece)""".stripMargin
      (Seq(segChain(r.toString, s"vocab$r"), cnt, vraw) ++
        (if (r + 1 < R) Seq(vocabCte(s"vocab${r + 1}", s"v${r + 1}raw")) else Nil))
        .mkString(",\n")
    }

    /** Everything through the pruned final count table `finraw(piece, c)`:
      * ASCII word counts, char + top-substring seed, R EM rounds.
      */
    lazy val trainCtes: String =
      s"""WITH tok AS (SELECT unnest($TokensSql) AS word FROM documents),
         |wc0 AS (SELECT word, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY word),
         |words AS MATERIALIZED (
         |  SELECT word, n, len(word) AS m FROM wc0
         |  WHERE regexp_matches(word, '^[\\x21-\\x7e]{1,$ML}$$')),
         |subs AS MATERIALIZED (
         |  SELECT substr(w.word, ii.i - ll.L + 1, ll.L) AS piece,
         |         CAST(sum(w.n) AS BIGINT) AS c
         |  FROM words w, range(1, ${ML + 1}) ii(i), range(1, ${MP + 1}) ll(L)
         |  WHERE ii.i <= w.m AND ll.L <= ii.i
         |  GROUP BY 1),
         |v0raw AS MATERIALIZED (
         |  SELECT piece, c FROM subs WHERE len(piece) = 1
         |  UNION ALL
         |  SELECT piece, c FROM (SELECT piece, c FROM subs WHERE len(piece) > 1
         |                        ORDER BY c DESC, piece LIMIT $TOPV)),
         |ch AS MATERIALIZED (SELECT piece FROM v0raw WHERE len(piece) = 1),
         |${vocabCte("vocab0", "v0raw")},
         |${(0 until R).map(roundCtes).mkString(",\n")},
         |finraw AS MATERIALIZED (
         |  SELECT piece, c FROM v${R}raw WHERE len(piece) = 1 OR c >= $MINC)""".stripMargin

    /** trainCtes + the final rescored vocab + one more segmentation of the
      * corpus words under it — the ENCODE path; ends with `segf`.
      */
    lazy val encodeCtes: String =
      s"""$trainCtes,
         |${vocabCte("vocabf", "finraw")},
         |${segChain("f", "vocabf")}""".stripMargin
  }

  private[graft] lazy val UnigramLmOracleSql: String =
    s"""${UnigramOracle.trainCtes}
       |SELECT piece, c AS cnt,
       |       CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
       |       - (SELECT CAST(floor(ln(CAST(sum(c) AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
       |          FROM finraw) AS logp_micro
       |FROM finraw""".stripMargin

  /** Corpus subword vocabulary under the trained unigram table — the
    * ENCODE-path twin of q_bpe_subwords, replayed end to end.
    */
  private[graft] lazy val UnigramSubwordsOracleSql: String =
    s"""${UnigramOracle.encodeCtes}
       |SELECT s.piece AS subword, CAST(sum(w.n) AS BIGINT) AS n_tokens
       |FROM segf s JOIN words w USING (word) GROUP BY s.piece""".stripMargin

  /** Round-trip contract replay: the extraction CTEs carry each piece's
    * start offset j, so the oracle re-assembles every word with
    * `string_agg(piece, '' ORDER BY j)` and counts exact matches.
    */
  private[graft] lazy val UnigramRoundtripOracleSql: String = {
    val allp = (1 to UnigramOracle.ML)
      .map(k => s"SELECT word, j, piece FROM ef_$k")
      .mkString("\n  UNION ALL\n  ")
    s"""${UnigramOracle.encodeCtes},
       |allp AS (
       |  $allp),
       |rt AS (SELECT word, string_agg(piece, '' ORDER BY j) AS cat
       |       FROM allp GROUP BY word)
       |SELECT CAST(count(*) AS BIGINT) AS n_words,
       |       CAST(sum(CASE WHEN r.cat = w.word THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_roundtrip
       |FROM words w LEFT JOIN rt r USING (word)""".stripMargin
  }

  /** Token-meter replay: per-unique-word piece counts from the encode
    * chain's segf, joined back to each document's token positions;
    * documents LEFT-joined so an empty-token document still reports a
    * zero row (matching the stateless projection).
    */
  private[graft] lazy val TokenMeterOracleSql: String =
    s"""${UnigramOracle.encodeCtes},
       |pw AS (SELECT word, CAST(count(*) AS BIGINT) AS np FROM segf GROUP BY word),
       |dt AS (SELECT doc_id, unnest($TokensSql) AS word FROM documents),
       |ag AS (
       |  SELECT dt.doc_id,
       |         CAST(count(*) AS BIGINT) AS n_words,
       |         CAST(sum(coalesce(pw.np, 0)) AS BIGINT) AS n_pieces,
       |         CAST(sum(CASE WHEN pw.word IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |           AS n_uncovered
       |  FROM dt LEFT JOIN pw USING (word) GROUP BY dt.doc_id)
       |SELECT d.doc_id,
       |       coalesce(ag.n_words, 0) AS n_words,
       |       coalesce(ag.n_pieces, 0) AS n_pieces,
       |       coalesce(ag.n_uncovered, 0) AS n_uncovered
       |FROM documents d LEFT JOIN ag USING (doc_id)""".stripMargin

  /** Tokenizer fertility under the trained unigram table: weighted pieces
    * per word occurrence and chars per piece — exact BIGINT sums, floor
    * divisions (all operands non-negative, so DuckDB // ≡ Spark DIV).
    */
  private[graft] lazy val UnigramFertilityOracleSql: String =
    s"""${UnigramOracle.encodeCtes},
       |pw AS (SELECT word, CAST(count(*) AS BIGINT) AS np FROM segf GROUP BY word),
       |ag AS (SELECT CAST(sum(w.n) AS BIGINT) AS n_words,
       |              CAST(sum(w.n * p.np) AS BIGINT) AS n_pieces,
       |              CAST(sum(w.n * w.m) AS BIGINT) AS n_chars
       |       FROM words w JOIN pw p USING (word))
       |SELECT n_words, n_pieces, n_chars,
       |       n_pieces * 1000000 // n_words AS fertility_micros,
       |       n_chars * 1000000 // n_pieces AS chars_per_piece_micros
       |FROM ag""".stripMargin
}
