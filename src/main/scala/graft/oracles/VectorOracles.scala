package graft.oracles

import graft.functions.Money
import graft.oracles.SharedCtes._

/** Generated DuckDB oracle replays: embedding-space family (ANN
  * indexes, near-dup LSH, k-means/IVF/PQ replays, MMR, coresets).
  *
  * Moved verbatim out of SparkEntry.scala (r18 split); the
  * `SparkEntry.oracleSql` map keeps every `"q..." ->` key and
  * references these by name.
  */
private[graft] object VectorOracles {

  /** SemDeDup-det replay: the k-means trajectory re-generated over the
    * planted-union subset (kmeansCtesFrom), within-cluster cosine pairs
    * at the same threshold spelling as q_semdedup_subset, keep-first
    * survivors grouped by label. The cluster-size cap is identity here
    * (≤ 2003 rows total, cap 10000) and is therefore not replayed.
    */
  private[graft] lazy val SemDedupDetOracleSql: String = {
    val src =
      """(SELECT vec_id, embedding, label FROM embeddings WHERE vec_id < 2000
        | UNION ALL
        | SELECT -vec_id AS vec_id, embedding, label FROM embeddings
        | WHERE vec_id BETWEEN 1 AND 3) srcx""".stripMargin
    s"""${kmeansCtesFrom(src, 8)},
       |ev AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
       |  FROM $src),
       |pcx AS (SELECT ev.vec_id, ev.v, a.cid FROM ev JOIN a3 a USING (vec_id)),
       |dp AS (
       |  SELECT DISTINCT b.vec_id AS dropped
       |  FROM pcx a JOIN pcx b ON a.cid = b.cid AND a.vec_id < b.vec_id
       |  WHERE list_cosine_similarity(a.v, b.v) >= 0.9)
       |SELECT e.label, CAST(count(*) AS BIGINT) AS n_survivors
       |FROM ev e LEFT JOIN dp ON dp.dropped = e.vec_id
       |WHERE dp.dropped IS NULL
       |GROUP BY e.label""".stripMargin
  }

  /** Generated replay of Similarity.simhashNearDupPairs over the planted
    * corpus: md5-parity Rademacher signs (DuckDB digit value =
    * strpos('0123456789abcdef', hex) − 1 ⟺ Spark conv(hex,16,10)), exact
    * BIGINT projections/signatures, bucket-equi pairs with the hot-bucket
    * cap, and the cos ≥ ½ verify in identical IEEE doubles.
    */
  /** Shared replay of the bucket-signature near-dup spellings: quantize
    * the planted-union corpus to integer micros, project against the
    * given sign/plane table CTE (`sg(b, j, s)`), pack sign bits, cap hot
    * buckets, bucket-equi pairs, exact cos ≥ ½, floor-6 cosine.
    */
  private[graft] def embedNearDupOracle(sgCte: String): String =
    s"""WITH pl AS (
       |  SELECT -vec_id AS vec_id, embedding FROM embeddings
       |  WHERE vec_id BETWEEN 1 AND 3),
       |allv AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
       |  UNION ALL SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM pl),
       |${bucketVerifyCtes(sgCte)}
       |SELECT id1, id2, cos6 FROM pairs""".stripMargin

  /** The shared bucket/verify replay body (ONE spelling for every
    * signature-bucketed near-dup oracle — `embedNearDupOracle` and the
    * semantic-decontamination chain both end here, so a cap/threshold
    * tuning cannot silently fork): expects an `allv(vec_id, emb DOUBLE[])`
    * CTE above it; quantize → project against `sg(b, j, s)` → pack sign
    * bits → cap hot buckets → bucket-equi pairs → exact cos ≥ ½ →
    * `pairs(id1, id2, cos6)`.
    */
  private def bucketVerifyCtes(sgCte: String): String =
    s"""q AS MATERIALIZED (
       |  SELECT vec_id,
       |         list_transform(list_slice(emb, 1, 64),
       |                        x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) AS xq
       |  FROM allv
       |  WHERE emb IS NOT NULL AND len(emb) >= 64),
       |$sgCte,
       |pj AS MATERIALIZED (
       |  SELECT q.vec_id, sg.b, CAST(sum(sg.s * q.xq[sg.j]) AS BIGINT) AS proj
       |  FROM q, sg GROUP BY q.vec_id, sg.b),
       |bk AS MATERIALIZED (
       |  SELECT vec_id,
       |         CAST(sum(CASE WHEN proj >= 0 THEN (CAST(1 AS BIGINT) << b)
       |                       ELSE 0 END) AS BIGINT) AS bucket
       |  FROM pj GROUP BY vec_id),
       |bc AS (SELECT bucket, count(*) AS c FROM bk GROUP BY bucket),
       |bb AS MATERIALIZED (
       |  SELECT bk.vec_id, bk.bucket, q.xq
       |  FROM bk JOIN q USING (vec_id) JOIN bc USING (bucket)
       |  WHERE bc.c <= 10000),
       |pr AS (
       |  SELECT l.vec_id AS id1, r.vec_id AS id2,
       |         CAST(list_sum(list_transform(range(1, 65),
       |              i -> l.xq[i] * r.xq[i])) AS BIGINT) AS d,
       |         CAST(list_sum(list_transform(range(1, 65),
       |              i -> l.xq[i] * l.xq[i])) AS BIGINT) AS na,
       |         CAST(list_sum(list_transform(range(1, 65),
       |              i -> r.xq[i] * r.xq[i])) AS BIGINT) AS nb
       |  FROM bb l JOIN bb r ON l.bucket = r.bucket AND l.vec_id < r.vec_id),
       |fl AS (
       |  SELECT id1, id2, d, na, nb FROM pr
       |  WHERE d > 0 AND 4.0 * (CAST(d AS DOUBLE) * CAST(d AS DOUBLE))
       |        >= CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)),
       |pairs AS (
       |  SELECT id1, id2,
       |         max(floor(CAST(d AS DOUBLE) / sqrt(CAST(na AS DOUBLE))
       |             / sqrt(CAST(nb AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0) AS cos6
       |  FROM fl GROUP BY id1, id2)""".stripMargin

  /** Shared CTE chain for the semantic-decontamination pair replay:
    * corpus ∪ paraphrased benchmark (+0.0002/dim in the double domain —
    * IEEE addition both engines perform identically — keyed -vec_id-1),
    * then the embedNearDupOracle chain (md5-Rademacher signs, exact
    * BIGINT signatures, hot-bucket cap, exact cos ≥ ½), ending in
    * `cn(corpus_id, bench_id, cos6)` = the cross-side survivors.
    */
  private[graft] lazy val SemanticDecontCtes: String =
    s"""WITH allv AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
       |  UNION ALL
       |  SELECT -vec_id - 1 AS vec_id,
       |         list_transform(CAST(embedding AS DOUBLE[]), x -> x + 0.0002) AS emb
       |  FROM embeddings WHERE vec_id % 97 = 0),
       |${bucketVerifyCtes(MdSignsCte)},
       |cn AS (
       |  SELECT id2 AS corpus_id, id1 AS bench_id, cos6 FROM pairs
       |  WHERE id1 < 0 AND id2 >= 0)""".stripMargin

  private[graft] lazy val SemanticDecontOracleSql: String =
    s"""$SemanticDecontCtes,
       |ag AS (
       |  SELECT corpus_id, CAST(count(*) AS BIGINT) AS n_bench_hits,
       |         max(cos6) AS cos6_max
       |  FROM cn GROUP BY corpus_id)
       |SELECT a.corpus_id, e.label, a.n_bench_hits, a.cos6_max
       |FROM ag a JOIN embeddings e ON e.vec_id = a.corpus_id""".stripMargin

  private[graft] lazy val SemanticDecontFractionOracleSql: String =
    s"""$SemanticDecontCtes,
       |corpus AS (
       |  SELECT vec_id, label FROM embeddings
       |  WHERE embedding IS NOT NULL AND len(embedding) >= 64),
       |fg AS (SELECT DISTINCT corpus_id FROM cn)
       |SELECT c.label, CAST(count(*) AS BIGINT) AS n_corpus,
       |       CAST(sum(CASE WHEN fg.corpus_id IS NOT NULL THEN 1 ELSE 0 END)
       |            AS BIGINT) AS n_flagged,
       |       CAST(sum(CASE WHEN fg.corpus_id IS NOT NULL THEN 1 ELSE 0 END)
       |            * 1000000 // count(*) AS BIGINT) AS frac_e6
       |FROM corpus c LEFT JOIN fg ON fg.corpus_id = c.vec_id
       |GROUP BY c.label""".stripMargin

  /** md5-parity Rademacher sign table (DuckDB digit value =
    * strpos('0123456789abcdef', hex) − 1 ⟺ Spark conv(hex,16,10)) — the
    * one spelling shared by q_simhash_embed_neardup and the
    * semantic-decontamination chain.
    */
  private val MdSignsCte: String =
    """sg AS MATERIALIZED (
      |  SELECT b.b, j.j,
      |         CASE WHEN strpos('0123456789abcdef',
      |                          substr(md5(b.b || ':' || j.j), 1, 1)) % 2 = 1
      |              THEN 1 ELSE -1 END AS s
      |  FROM range(0, 8) b(b), range(1, 65) j(j))""".stripMargin

  private[graft] lazy val SimhashEmbedOracleSql: String =
    embedNearDupOracle(MdSignsCte)

  /** q_cosine_neardup's replay: the SAME seeded Gaussian hyperplanes the
    * Spark plan uses, embedded as 512 integer-micro literals (they are
    * driver-side constants, so both engines see identical planes) — the
    * rest of the chain is the shared bucket/verify replay.
    */
  private[graft] lazy val CosineNearDupOracleSql: String = {
    val vals = graft.functions.VectorFunctions.gaussianMicroPlanes(8, 64, 42L)
      .zipWithIndex
      .flatMap { case (p, b) =>
        p.zipWithIndex.map { case (g, j0) => s"($b, ${j0 + 1}, $g)" }
      }
      .grouped(8).map(_.mkString(", ")).mkString(",\n  ")
    embedNearDupOracle(
      s"""sg AS MATERIALIZED (
         |  SELECT * FROM (VALUES
         |  $vals) t(b, j, s))""".stripMargin)
  }

  /** q_knn_lsh's replay (Similarity.lshKnnDet): the SAME per-table seeded
    * Gaussian hyperplanes as integer-micro literals (nTables·nPlanes·64
    * rows — driver-side constants, identical in both engines), exact
    * BIGINT bucket signatures per table, Hamming-1 probe expansion via
    * XOR, DISTINCT bucket-mate candidates, and the floor-6 cosine +
    * row_number rank replay shared with q_knn_bruteforce.
    */
  private[graft] lazy val KnnLshOracleSql: String = {
    val nPlanes = 4
    val nTables = 4
    val vals = (0 until nTables).flatMap { t =>
      graft.functions.VectorFunctions.gaussianMicroPlanes(nPlanes, 64, 42L + t)
        .zipWithIndex.flatMap { case (p, b) =>
          p.zipWithIndex.map { case (g, j0) => s"($t, $b, ${j0 + 1}, $g)" }
        }
    }.grouped(6).map(_.mkString(", ")).mkString(",\n  ")
    s"""WITH sg AS MATERIALIZED (
       |  SELECT * FROM (VALUES
       |  $vals) t(t, b, j, s)),
       |q AS MATERIALIZED (
       |  SELECT vec_id,
       |         list_transform(list_slice(CAST(embedding AS DOUBLE[]), 1, 64),
       |                        x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) AS xq
       |  FROM embeddings
       |  WHERE embedding IS NOT NULL AND len(embedding) >= 64),
       |pj AS MATERIALIZED (
       |  SELECT q.vec_id, sg.t, sg.b,
       |         CAST(sum(sg.s * q.xq[sg.j]) AS BIGINT) AS proj
       |  FROM q, sg GROUP BY 1, 2, 3),
       |bk AS MATERIALIZED (
       |  SELECT vec_id, t,
       |         CAST(sum(CASE WHEN proj >= 0 THEN (CAST(1 AS BIGINT) << b)
       |                       ELSE 0 END) AS BIGINT) AS bucket
       |  FROM pj GROUP BY 1, 2),
       |fl AS (
       |  SELECT CAST(CASE WHEN f < 0 THEN 0
       |                   ELSE (CAST(1 AS BIGINT) << f) END AS BIGINT) AS flip
       |  FROM range(-1, $nPlanes) r(f)),
       |qp AS (
       |  SELECT bk.vec_id AS query_id, bk.t, xor(bk.bucket, fl.flip) AS bucket
       |  FROM bk CROSS JOIN fl WHERE bk.vec_id < 5),
       |cand AS (
       |  SELECT DISTINCT qp.query_id, bk.vec_id AS neighbor_id
       |  FROM qp JOIN bk ON bk.t = qp.t AND bk.bucket = qp.bucket
       |  WHERE bk.vec_id <> qp.query_id),
       |sc AS (
       |  SELECT c.query_id, c.neighbor_id,
       |         CAST(list_sum(list_transform(range(1, 65),
       |              i -> a.xq[i] * b.xq[i])) AS BIGINT) AS dp,
       |         CAST(list_sum(list_transform(range(1, 65),
       |              i -> a.xq[i] * a.xq[i])) AS BIGINT) AS na,
       |         CAST(list_sum(list_transform(range(1, 65),
       |              i -> b.xq[i] * b.xq[i])) AS BIGINT) AS nb
       |  FROM cand c
       |  JOIN q a ON a.vec_id = c.query_id
       |  JOIN q b ON b.vec_id = c.neighbor_id),
       |cs AS (
       |  SELECT query_id, neighbor_id,
       |         floor(CAST(dp AS DOUBLE) / sqrt(CAST(na AS DOUBLE))
       |               / sqrt(CAST(nb AS DOUBLE)) * 1000000.0 + 0.5)
       |           / 1000000.0 AS cos6
       |  FROM sc WHERE na > 0 AND nb > 0),
       |rk AS (
       |  SELECT query_id, neighbor_id, cos6,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY cos6 DESC, neighbor_id) AS rank
       |  FROM cs)
       |SELECT query_id, neighbor_id, cos6, rank FROM rk WHERE rank <= 10""".stripMargin
  }

  /** Shared CTE prefix for the PQ oracles: deterministic codebook (8 lowest
    * vec_ids, m=4 subspaces × 16 dims), per-(vector, subspace, centroid)
    * squared distances, and the argmin code assignment.
    */
  private[graft] val PqEncodeSql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |cbrow AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, v
      |          FROM e ORDER BY vec_id LIMIT 8),
      |sub AS (SELECT s FROM generate_series(0, 3) t(s)),
      |cb AS (SELECT s, code, v[(s*16+1):((s+1)*16)] AS cv FROM cbrow, sub),
      |d AS (SELECT vec_id, s, v[(s*16+1):((s+1)*16)] AS dv FROM e, sub),
      |dist AS (
      |  SELECT d.vec_id, d.s, cb.code,
      |         list_sum(list_transform(list_zip(d.dv, cb.cv),
      |                                 p -> (p[1]-p[2])*(p[1]-p[2]))) AS sq
      |  FROM d JOIN cb USING (s)),
      |enc AS (
      |  SELECT vec_id, s, code, sq FROM
      |    (SELECT *, row_number() OVER (PARTITION BY vec_id, s
      |                                  ORDER BY sq, code) AS rn FROM dist)
      |  WHERE rn = 1)""".stripMargin

  /** Generated DuckDB replay of KMeansReplay.clusterStats (d=64, k=8,
    * 3 rounds): integer-micros points via the floor(x·10⁶+0.5) spelling,
    * md5-rank seeds, per-round cross-join argmin (QUALIFY over (dist, cid))
    * and floor(S/n + 0.5) centers — every distance an exact BIGINT, every
    * center one replayed double division, so the hash match is structural.
    */
  /** Generated replay of KCenter.greedyCoreset(d=64, k=8): md5-min start,
    * per-round farthest point under (dmin DESC, vec_id) with already-
    * selected ids excluded, LEAST-folded running dmin, final nearest-
    * center assignment by (d2, c_id) row_number. Distances are the same
    * BIGINT Σ(Δ²) as the k-means oracle, via range(1,65) list lambdas.
    */
  /** MMR greedy replay, the KCenter unrolled-round pattern: r0 carries the
    * exact BIGINT relevance dot; g_i carries the running max-similarity to
    * the i selected; s_i is the i-th argmax of 7·rel − 3·smax (score DESC,
    * vec_id) — round 1 is argmax rel (smax ≔ 0, the MMR convention).
    */
  /** The MMR greedy replay as a reusable CTE chain ending in
    * `mmr_sel(sel_rank, vec_id, rel_dot, mmr_score)` — consumed by both
    * the trajectory oracle (q_mmr_selection) and the context-packing
    * oracle (q_context_pack) so the replayed selection cannot drift.
    */
  private[graft] lazy val MmrCtes: String = {
    val K = 8
    def dot(a: String, b: String) =
      s"CAST(list_sum(list_transform(range(1, 65), i -> $a.m[i] * $b.m[i])) AS BIGINT)"
    val rounds = (2 to K).flatMap { i =>
      Seq(
        s"""s$i AS MATERIALIZED (
           |  SELECT vec_id, m, rel, 7 * rel - 3 * smax AS score FROM g${i - 1}
           |  WHERE vec_id NOT IN (${(1 until i).map(j => s"SELECT vec_id FROM s$j").mkString(" UNION ALL ")})
           |  ORDER BY score DESC, vec_id LIMIT 1)""".stripMargin) ++
        (if (i < K) Seq(
          s"""g$i AS MATERIALIZED (
             |  SELECT g.vec_id, g.m, g.rel, GREATEST(g.smax, ${dot("g", s"s$i")}) AS smax
             |  FROM g${i - 1} g CROSS JOIN s$i)""".stripMargin)
        else Nil)
    }.mkString(",\n")
    val sel = (1 to K)
      .map(i => s"SELECT $i AS sel_rank, vec_id, rel AS rel_dot, score AS mmr_score FROM s$i")
      .mkString(" UNION ALL ")
    s"""WITH em AS MATERIALIZED (
       |  SELECT vec_id,
       |         list_transform(list_slice(CAST(embedding AS DOUBLE[]), 1, 64),
       |                        x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) AS m
       |  FROM embeddings
       |  WHERE embedding IS NOT NULL AND len(embedding) >= 64),
       |q AS MATERIALIZED (SELECT m FROM em WHERE vec_id = 0),
       |r0 AS MATERIALIZED (
       |  SELECT em.vec_id, em.m, ${dot("em", "q")} AS rel
       |  FROM em CROSS JOIN q WHERE em.vec_id <> 0),
       |s1 AS MATERIALIZED (
       |  SELECT vec_id, m, rel, 7 * rel AS score FROM r0
       |  ORDER BY rel DESC, vec_id LIMIT 1),
       |g1 AS MATERIALIZED (
       |  SELECT r.vec_id, r.m, r.rel, ${dot("r", "s1")} AS smax
       |  FROM r0 r CROSS JOIN s1),
       |$rounds,
       |mmr_sel AS ($sel)""".stripMargin
  }

  private[graft] lazy val MmrOracleSql: String =
    s"""$MmrCtes
       |SELECT sel_rank, vec_id, rel_dot, mmr_score FROM mmr_sel""".stripMargin

  /** ContextPack replay: the shared MMR trajectory joined to exact token
    * counts, BIGINT prefix sum in sel_rank order, prefix kept while
    * cum ≤ budget (monotone cum ⇒ the filter IS stop-at-first-overflow).
    */
  private[graft] lazy val ContextPackOracleSql: String =
    s"""$MmrCtes,
       |tk AS (SELECT doc_id, len($TokensSql) AS n_tokens FROM documents),
       |pk AS (
       |  SELECT m.sel_rank, m.vec_id AS doc_id,
       |         CAST(t.n_tokens AS BIGINT) AS n_tokens,
       |         CAST(sum(t.n_tokens) OVER (ORDER BY m.sel_rank
       |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |           AS cum_tokens
       |  FROM mmr_sel m JOIN tk t ON t.doc_id = m.vec_id)
       |SELECT sel_rank, doc_id, n_tokens, cum_tokens FROM pk
       |WHERE cum_tokens <= 120""".stripMargin

  private[graft] lazy val KCenterOracleSql: String = {
    val K = 8
    def dist(a: String, b: String) =
      s"CAST(list_sum(list_transform(range(1, 65), i -> ($a.m[i] - $b.m[i]) * ($a.m[i] - $b.m[i]))) AS BIGINT)"
    val rounds = (2 to K).flatMap { i =>
      Seq(
        s"""s$i AS MATERIALIZED (
           |  SELECT vec_id, m FROM d${i - 1}
           |  WHERE vec_id NOT IN (${(1 until i).map(j => s"SELECT vec_id FROM s$j").mkString(" UNION ALL ")})
           |  ORDER BY dmin DESC, vec_id LIMIT 1)""".stripMargin) ++
        (if (i < K) Seq(
          s"""d$i AS MATERIALIZED (
             |  SELECT d.vec_id, d.m, LEAST(d.dmin, ${dist("d", s"s$i")}) AS dmin
             |  FROM d${i - 1} d CROSS JOIN s$i)""".stripMargin)
        else Nil)
    }.mkString(",\n")
    val selUnion = (1 to K)
      .map(i => s"SELECT vec_id AS c_id, m AS cm, $i AS sel_rank FROM s$i")
      .mkString(" UNION ALL ")
    s"""WITH em AS MATERIALIZED (
       |  SELECT vec_id,
       |         list_transform(list_slice(CAST(embedding AS DOUBLE[]), 1, 64),
       |                        x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) AS m
       |  FROM embeddings
       |  WHERE embedding IS NOT NULL AND len(embedding) >= 64),
       |s1 AS MATERIALIZED (
       |  SELECT vec_id, m FROM em
       |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 1),
       |d1 AS MATERIALIZED (
       |  SELECT em.vec_id, em.m, ${dist("em", "s1")} AS dmin
       |  FROM em CROSS JOIN s1),
       |$rounds,
       |selc AS MATERIALIZED ($selUnion),
       |a AS (
       |  SELECT em.vec_id, selc.c_id, selc.sel_rank,
       |         CAST(list_sum(list_transform(range(1, 65),
       |              i -> (em.m[i] - selc.cm[i]) * (em.m[i] - selc.cm[i]))) AS BIGINT) AS d2
       |  FROM em CROSS JOIN selc),
       |n AS (
       |  SELECT vec_id, c_id, d2,
       |         row_number() OVER (PARTITION BY vec_id ORDER BY d2, c_id) AS rn
       |  FROM a)
       |SELECT n.vec_id, n.c_id AS nearest_center, n.d2,
       |       CAST(coalesce(s.sel_rank, 0) AS INT) AS sel_rank
       |FROM n LEFT JOIN (SELECT c_id, sel_rank FROM selc) s ON s.c_id = n.vec_id
       |WHERE n.rn = 1""".stripMargin
  }

  /** Generated DuckDB replay of the ENTIRE r16 deterministic IVFADC index
    * (ivfAdcKnn: nLists=8, nProbe=4, m=4, codes=16, rerank=50, k=10):
    * md5-ranked 4096-sample, coarse Lloyd (5 rounds) and per-subspace
    * residual Lloyd (3 rounds) replayed as unrolled CTE pairs (assignment
    * = row_number over (exact-BIGINT dist, cid); centers = floor(S/n+0.5)
    * with empty-cluster renumbering by row_number OVER (ORDER BY cid));
    * full-corpus posting via double sqDist folds against the /1e6 centers
    * (list_sum(list_transform(list_zip(...))) IS the Spark left fold —
    * the q_pq_subset precedent); probes by sqrt-fold crank; ADC as the
    * (list, s, code) join with list_sum(list(sq ORDER BY s)); exact
    * rerank of the 50-shortlist. Every tie-break is (value, id); every
    * float op is one IEEE op both engines share — the hash is structural.
    */
  private[graft] lazy val IvfPqOracleSql: String = {
    def zsq(a: String, b: String) =
      s"list_sum(list_transform(list_zip($a, $b), z -> (z[1]-z[2])*(z[1]-z[2])))"
    def zsqI(a: String, b: String) = s"CAST(${zsq(a, b)} AS BIGINT)"
    def sl(c: String, s: Int) = s"$c[(${s * 16} + 1):${(s + 1) * 16}]"
    // one Lloyd round over sample `samp`(rn, m): assignment vs c{r-1},
    // per-dim exact sums, floor(S/n + 0.5), empty-cluster renumber
    def round(pfx: String, samp: String, r: Int, dims: Int): String =
      s"""${pfx}a$r AS MATERIALIZED (
         |  SELECT rn, m, cid FROM (
         |    SELECT p.rn, p.m, c.cid,
         |           row_number() OVER (PARTITION BY p.rn
         |                              ORDER BY ${zsqI("p.m", "c.m")}, c.cid) AS a
         |    FROM $samp p CROSS JOIN ${pfx}c${r - 1} c) WHERE a = 1),
         |${pfx}c$r AS MATERIALIZED (
         |  SELECT row_number() OVER (ORDER BY cid) - 1 AS cid, m FROM (
         |    SELECT cid, list(cv ORDER BY pos) AS m FROM (
         |      SELECT cid, pos,
         |             CAST(floor(CAST(sum(val) AS DOUBLE) / CAST(count(*) AS DOUBLE) + 0.5) AS BIGINT) AS cv
         |      FROM (SELECT cid, unnest(range(1, ${dims + 1})) AS pos, unnest(m) AS val FROM ${pfx}a$r)
         |      GROUP BY cid, pos) GROUP BY cid))""".stripMargin
    val coarseRounds = (1 to 5).map(r => round("k", "cs0", r, 64)).mkString(",\n")
    val residTrain = (0 until 4).map { s =>
      val seeds = s"b${s}c0 AS MATERIALIZED (SELECT rn - 1 AS cid, ${sl("rm", s)} AS m FROM rs0 WHERE rn <= 16)"
      val rounds = (1 to 3).map(r => round(s"b$s", s"(SELECT rn, ${sl("rm", s)} AS m FROM rs0)", r, 16)).mkString(",\n")
      val dbl = s"b${s}d AS MATERIALIZED (SELECT cid, list_transform(m, x -> CAST(x AS DOUBLE) / 1000000.0) AS cv FROM b${s}c3)"
      s"$seeds,\n$rounds,\n$dbl"
    }.mkString(",\n")
    val encUnion = (0 until 4).map { s =>
      s"""SELECT neighbor_id, list_id, $s AS s, cid AS code FROM (
         |  SELECT p.neighbor_id, p.list_id, c.cid,
         |         row_number() OVER (PARTITION BY p.neighbor_id
         |                            ORDER BY ${zsq(sl("p.resid", s), "c.cv")}, c.cid) AS a
         |  FROM prm p CROSS JOIN b${s}d c) WHERE a = 1""".stripMargin
    }.mkString("\nUNION ALL\n")
    val qtUnion = (0 until 4).map { s =>
      s"""SELECT p.query_id, p.list_id, $s AS s, c.cid AS code,
         |       ${zsq(sl("p.qr", s), "c.cv")} AS sq
         |FROM pb p CROSS JOIN b${s}d c""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |         list_transform(CAST(embedding AS DOUBLE[]),
       |                        x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) AS m,
       |         md5(CAST(vec_id AS VARCHAR)) AS h
       |  FROM embeddings),
       |cs0 AS MATERIALIZED (
       |  SELECT row_number() OVER (ORDER BY h, vec_id) AS rn, m
       |  FROM e ORDER BY h, vec_id LIMIT 4096),
       |kc0 AS MATERIALIZED (SELECT rn - 1 AS cid, m FROM cs0 WHERE rn <= 8),
       |$coarseRounds,
       |ccd AS MATERIALIZED (
       |  SELECT cid, list_transform(m, x -> CAST(x AS DOUBLE) / 1000000.0) AS cv FROM kc5),
       |pa AS MATERIALIZED (
       |  SELECT vec_id AS neighbor_id, v, list_id, cv FROM (
       |    SELECT e.vec_id, e.v, c.cid AS list_id, c.cv,
       |           row_number() OVER (PARTITION BY e.vec_id
       |                              ORDER BY ${zsq("e.v", "c.cv")}, c.cid) AS a
       |    FROM e CROSS JOIN ccd c) WHERE a = 1),
       |prm AS MATERIALIZED (
       |  SELECT neighbor_id, list_id, resid,
       |         list_transform(resid, x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) AS rm,
       |         md5(CAST(neighbor_id AS VARCHAR)) AS h
       |  FROM (SELECT neighbor_id, list_id,
       |               list_transform(list_zip(v, cv), z -> z[1] - z[2]) AS resid
       |        FROM pa)),
       |rs0 AS MATERIALIZED (
       |  SELECT row_number() OVER (ORDER BY h, neighbor_id) AS rn, rm
       |  FROM prm ORDER BY h, neighbor_id LIMIT 4096),
       |$residTrain,
       |enc AS MATERIALIZED (
       |$encUnion),
       |pb AS MATERIALIZED (
       |  SELECT query_id, list_id, qr FROM (
       |    SELECT q.vec_id AS query_id, c.cid AS list_id,
       |           list_transform(list_zip(q.v, c.cv), z -> z[1] - z[2]) AS qr,
       |           row_number() OVER (PARTITION BY q.vec_id
       |                              ORDER BY sqrt(${zsq("q.v", "c.cv")}), c.cid) AS crank
       |    FROM (SELECT vec_id, v FROM e WHERE vec_id < 5) q CROSS JOIN ccd c)
       |  WHERE crank <= 4),
       |qt AS MATERIALIZED (
       |$qtUnion),
       |score AS (
       |  SELECT qt.query_id, enc.neighbor_id,
       |         list_sum(list(qt.sq ORDER BY qt.s)) AS adist
       |  FROM enc JOIN qt
       |    ON qt.list_id = enc.list_id AND qt.s = enc.s AND qt.code = enc.code
       |  WHERE enc.neighbor_id <> qt.query_id
       |  GROUP BY 1, 2),
       |shortlist AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |           row_number() OVER (PARTITION BY query_id ORDER BY adist, neighbor_id) AS rank
       |    FROM score) WHERE rank <= 50),
       |rr AS (
       |  SELECT sl.query_id, sl.neighbor_id, ${zsq("q.v", "n.v")} AS sq_l2
       |  FROM shortlist sl
       |  JOIN e q ON q.vec_id = sl.query_id
       |  JOIN e n ON n.vec_id = sl.neighbor_id)
       |SELECT query_id, neighbor_id, round(sq_l2, 6) AS sq_l2,
       |       CAST(rank AS INT) AS rank FROM (
       |  SELECT query_id, neighbor_id, sq_l2,
       |         row_number() OVER (PARTITION BY query_id ORDER BY sq_l2, neighbor_id) AS rank
       |  FROM rr) WHERE rank <= 10""".stripMargin
  }

  private[graft] lazy val KMeansOracleSql: String =
    s"""$KMeansCtes
       |SELECT cid AS cluster_id, count(*) AS n_points,
       |       CAST(sum(dist) AS BIGINT) AS inertia
       |FROM a3 GROUP BY cid""".stripMargin

  /** Generated replay of IvfReplay.knn (nLists=8, rounds=3, nProbe=4,
    * k=10): the shared KMeansCtes quantizer trajectory gives the round-3
    * centers (c3) and posting lists (a3); probes are the 4 centroid ranks
    * per query under (exact BIGINT distance, cid); candidates are the
    * probed lists minus self; scoring is the same exact Σ(Δ²) between
    * query and neighbor micros; top-10 by (d2, neighbor_id). Every number
    * is BIGINT arithmetic — the hash match is structural.
    */
  /** The IVF-det replay as a reusable chain ending in
    * `r(query_id, neighbor_id, d2, rank)` — shared by the top-k oracle and
    * the recall oracle so the replayed retrieval cannot drift.
    */
  private[graft] lazy val IvfDetCtes: String = {
    val dims = 0 until 64
    val pcDist = dims.map(i => s"(p.x$i - c.x$i) * (p.x$i - c.x$i)").mkString(" + ")
    val qnDist = dims.map(i => s"(q.x$i - n.x$i) * (q.x$i - n.x$i)").mkString(" + ")
    s"""$KMeansCtes,
       |pr AS (
       |  SELECT p.vec_id AS query_id, c.cid,
       |         row_number() OVER (PARTITION BY p.vec_id ORDER BY $pcDist, c.cid) AS prk
       |  FROM pts p CROSS JOIN c3 c
       |  WHERE p.vec_id < 5),
       |cand AS (
       |  SELECT pr.query_id, a.vec_id AS neighbor_id
       |  FROM pr JOIN a3 a ON pr.cid = a.cid
       |  WHERE pr.prk <= 4 AND a.vec_id <> pr.query_id),
       |sc AS (
       |  SELECT cd.query_id, cd.neighbor_id, $qnDist AS d2
       |  FROM cand cd
       |  JOIN pts q ON q.vec_id = cd.query_id
       |  JOIN pts n ON n.vec_id = cd.neighbor_id),
       |r AS (
       |  SELECT query_id, neighbor_id, d2,
       |         row_number() OVER (PARTITION BY query_id ORDER BY d2, neighbor_id) AS rank
       |  FROM sc)""".stripMargin
  }

  private[graft] lazy val IvfDetOracleSql: String =
    s"""$IvfDetCtes
       |SELECT query_id, neighbor_id, d2, rank FROM r WHERE rank <= 10""".stripMargin

  /** IVF recall@10 vs the exact integer-L2 ranking over the same
    * quantized points — the retrieval QUALITY itself oracled (the
    * q_matryoshka_recall pattern): exact top-10 from a full scan, probed
    * top-10 from the shared IvfDetCtes, recall = hit count / 10 in exact
    * integer micros.
    */
  private[graft] lazy val IvfRecallOracleSql: String = {
    val dims = 0 until 64
    val qnDist = dims.map(i => s"(q.x$i - n.x$i) * (q.x$i - n.x$i)").mkString(" + ")
    s"""$IvfDetCtes,
       |exd AS (
       |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, $qnDist AS d2
       |  FROM pts q JOIN pts n ON n.vec_id <> q.vec_id
       |  WHERE q.vec_id < 5),
       |exr AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |           row_number() OVER (PARTITION BY query_id ORDER BY d2, neighbor_id) AS rank
       |    FROM exd)
       |  WHERE rank <= 10)
       |SELECT i.query_id,
       |       CAST(count(e.neighbor_id) AS BIGINT) AS n_hits,
       |       CAST(count(e.neighbor_id) * 1000000 // 10 AS BIGINT) AS recall_micros
       |FROM (SELECT query_id, neighbor_id FROM r WHERE rank <= 10) i
       |LEFT JOIN exr e
       |  ON e.query_id = i.query_id AND e.neighbor_id = i.neighbor_id
       |GROUP BY i.query_id""".stripMargin
  }

  /** RBO@10 replay between the probed-IVF ranking (shared IvfDetCtes `r`)
    * and the exact ranking (the IvfRecallOracleSql exact side, WITH rank):
    * depth weights (1−p)·p^(d−1)/d spliced as Double.toString literals,
    * overlap counts exact integers, per-term e6 quantization before the
    * integer sum — mirrors [[graft.operators.Rbo.rboAtK]].
    */
  private[graft] lazy val RboIvfOracleSql: String = {
    val dims = 0 until 64
    val qnDist = dims.map(i => s"(q.x$i - n.x$i) * (q.x$i - n.x$i)").mkString(" + ")
    val wvals = (1 to 10)
      .map(d => s"($d, ${((1.0d - 0.9d) * math.pow(0.9d, (d - 1).toDouble) / d).toString})")
      .mkString(", ")
    s"""$IvfDetCtes,
       |exd AS (
       |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, $qnDist AS d2
       |  FROM pts q JOIN pts n ON n.vec_id <> q.vec_id
       |  WHERE q.vec_id < 5),
       |exr AS (
       |  SELECT query_id, neighbor_id, rank FROM (
       |    SELECT query_id, neighbor_id,
       |           row_number() OVER (PARTITION BY query_id ORDER BY d2, neighbor_id) AS rank
       |    FROM exd)
       |  WHERE rank <= 10),
       |cm AS (
       |  SELECT a.query_id, greatest(a.rank, b.rank) AS m
       |  FROM (SELECT query_id, neighbor_id, rank FROM r WHERE rank <= 10) a
       |  JOIN exr b ON b.query_id = a.query_id AND b.neighbor_id = a.neighbor_id),
       |wt AS (SELECT * FROM (VALUES $wvals) t(d, wd)),
       |tm AS (
       |  SELECT query_id,
       |         CAST(sum(CAST(floor(x * wd * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS rbo_e6
       |  FROM (SELECT cm.query_id, wt.d, wt.wd, CAST(count(*) AS BIGINT) AS x
       |        FROM cm JOIN wt ON wt.d >= cm.m GROUP BY 1, 2, 3)
       |  GROUP BY query_id),
       |qq AS (SELECT DISTINCT query_id FROM r)
       |SELECT qq.query_id, coalesce(tm.rbo_e6, 0) AS rbo_e6
       |FROM qq LEFT JOIN tm USING (query_id)""".stripMargin
  }

  /** q_facility_select replay: 8 unrolled submodular-greedy rounds — the
    * floor-6 cosine pair table (KMeansReplay quantize + kNN cosine
    * spelling) is the ONLY float stage; best-so-far, marginal gains, the
    * argmax (gain DESC, c tie-break), and running coverage are all exact
    * BIGINT. MATERIALIZED per round — DuckDB would otherwise inline the
    * round chain exponentially (the q_bradley_terry lesson).
    */
  private[graft] lazy val FacilitySelectOracleSql: String = {
    val rounds = (1 to 8).map { i =>
      s"""bst$i AS MATERIALIZED (
         |  SELECT v, max(s) AS best FROM ps
         |  WHERE c IN (SELECT c FROM ch${i - 1}) GROUP BY v),
         |g$i AS MATERIALIZED (
         |  SELECT p.c,
         |         CAST(sum(GREATEST(p.s - coalesce(b.best, 0), 0)) AS BIGINT) AS gain
         |  FROM ps p LEFT JOIN bst$i b USING (v)
         |  WHERE p.c NOT IN (SELECT c FROM ch${i - 1})
         |  GROUP BY p.c),
         |c$i AS MATERIALIZED (SELECT c, gain FROM g$i ORDER BY gain DESC, c LIMIT 1),
         |ch$i AS (SELECT c FROM ch${i - 1} UNION ALL SELECT c FROM c$i)""".stripMargin
    }.mkString(",\n")
    val union = (1 to 8).map(i =>
      s"SELECT CAST($i AS BIGINT) AS sel_rank, c AS vec_id, gain AS gain_e6 FROM c$i")
      .mkString("\n  UNION ALL ")
    s"""WITH qn AS (
       |  SELECT vec_id,
       |         list_transform((CAST(embedding AS DOUBLE[]))[1:64],
       |                        x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) AS xq
       |  FROM embeddings
       |  WHERE embedding IS NOT NULL AND len(embedding) >= 64),
       |qq AS (SELECT vec_id, xq,
       |         CAST(list_sum(list_transform(xq, x -> x * x)) AS BIGINT) AS nrm
       |       FROM qn),
       |cand AS (SELECT vec_id AS c, xq AS cx, nrm AS cn
       |         FROM qq WHERE vec_id % 16 = 0 AND vec_id < 2048),
       |ps AS MATERIALIZED (
       |  SELECT v, c, s FROM (
       |    SELECT g.vec_id AS v, cand.c,
       |           CAST(floor(CAST(list_sum(list_transform(range(1, 65),
       |                              i -> g.xq[i] * cand.cx[i])) AS DOUBLE)
       |                      / sqrt(CAST(g.nrm AS DOUBLE))
       |                      / sqrt(CAST(cand.cn AS DOUBLE))
       |                      * 1000000.0 + 0.5) AS BIGINT) AS s
       |    FROM qq g CROSS JOIN cand
       |    WHERE g.nrm > 0 AND cand.cn > 0)
       |  WHERE s > 0),
       |ch0 AS (SELECT CAST(NULL AS BIGINT) AS c WHERE FALSE),
       |$rounds,
       |u AS (
       |  $union)
       |SELECT sel_rank, vec_id, gain_e6,
       |       CAST(sum(gain_e6) OVER (ORDER BY sel_rank) AS BIGINT) AS coverage_e6
       |FROM u""".stripMargin
  }
}
