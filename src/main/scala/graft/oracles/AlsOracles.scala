package graft.oracles

/** Generated DuckDB replay of the deterministic rank-2 ALS twin
  * (operators.AlsReplay): md5-seeded item init, three unrolled
  * MATERIALIZED half-solves (closed-form 2×2 ridge — exact BIGINT
  * normal-equation sums, ONE replayed double division per factor,
  * centi-unit clamp), then the recommendForAllUsers cross join with
  * BIGINT dot scores. Every CTE is MATERIALIZED — DuckDB would otherwise
  * inline the solve chain exponentially (the q_bradley_terry lesson).
  */
private[graft] object AlsOracles {

  /** One alternating half-solve CTE: solve `solveKey` from `fixedCte`
    * factors held fixed, joined through the capped ratings.
    */
  private def solveCte(
      name: String,
      fixedCte: String,
      fixedKey: String,
      solveKey: String): String =
    s"""$name AS MATERIALIZED (
       |  SELECT $solveKey,
       |         greatest(-400, least(400, CAST(floor(
       |             CAST(c*d1 - b*d2 AS DOUBLE) / CAST(a*c - b*b AS DOUBLE)
       |             * 10000.0 + 0.5) AS BIGINT))) AS f1,
       |         greatest(-400, least(400, CAST(floor(
       |             CAST(a*d2 - b*d1 AS DOUBLE) / CAST(a*c - b*b AS DOUBLE)
       |             * 10000.0 + 0.5) AS BIGINT))) AS f2
       |  FROM (
       |    SELECT r.$solveKey,
       |           1000 + CAST(sum(f.f1*f.f1) AS BIGINT) AS a,
       |           CAST(sum(f.f1*f.f2) AS BIGINT) AS b,
       |           1000 + CAST(sum(f.f2*f.f2) AS BIGINT) AS c,
       |           CAST(sum(r.r*f.f1) AS BIGINT) AS d1,
       |           CAST(sum(r.r*f.f2) AS BIGINT) AS d2
       |    FROM capped r JOIN $fixedCte f USING ($fixedKey)
       |    GROUP BY r.$solveKey))""".stripMargin

  /** Shared head of both ALS oracles: interactions → weighted ratings →
    * user-cap 20 → item-cap 1000 → md5-seeded item init.
    */
  private val RatingsAndInitCtes: String =
    s"""WITH inter AS (
       |  SELECT user_id,
       |         CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) AS item_id,
       |         event_type
       |  FROM events WHERE regexp_extract(props, '"k": (\\d+)', 1) <> ''),
       |ratings AS (
       |  SELECT user_id, item_id,
       |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 5
       |                       WHEN event_type = 'click' THEN 3
       |                       ELSE 1 END) AS BIGINT) AS r
       |  FROM inter GROUP BY user_id, item_id),
       |ucap AS (
       |  SELECT user_id, item_id, r FROM ratings
       |  QUALIFY row_number() OVER (PARTITION BY user_id
       |    ORDER BY r DESC, item_id) <= 20),
       |capped AS MATERIALIZED (
       |  SELECT user_id, item_id, r FROM ucap
       |  QUALIFY row_number() OVER (PARTITION BY item_id
       |    ORDER BY r DESC, user_id) <= 1000),
       |it0 AS MATERIALIZED (
       |  SELECT item_id,
       |         ('0x' || substr(md5('als1_' || CAST(item_id AS VARCHAR)), 1, 6))::BIGINT
       |           % 201 - 100 AS f1,
       |         ('0x' || substr(md5('als2_' || CAST(item_id AS VARCHAR)), 1, 6))::BIGINT
       |           % 201 - 100 AS f2
       |  FROM (SELECT DISTINCT item_id FROM capped))""".stripMargin

  /** Shared recommendation tail: top-3 per user by the exact BIGINT dot
    * against the final (us3, it2) factor tables.
    */
  private val RecTailSql: String =
    """rec AS (
      |  SELECT u.user_id, i.item_id,
      |         u.f1*i.f1 + u.f2*i.f2 AS score,
      |         row_number() OVER (PARTITION BY u.user_id
      |           ORDER BY u.f1*i.f1 + u.f2*i.f2 DESC, i.item_id) AS rank
      |  FROM us3 u CROSS JOIN it2 i)
      |SELECT user_id, CAST(rank AS INT) AS rank, item_id,
      |       CAST(score AS BIGINT) AS score
      |FROM rec WHERE rank <= 3""".stripMargin

  /** One IMPLICIT half-solve CTE (Hu–Koren): global Gram over the fixed
    * side (one row, cross-joined), α·r-weighted BIGINT corrections and
    * RHS, the 2×2 solve in identically-spelled double products (the
    * operator's overflow rationale — see AlsReplay.halfSolveImplicit).
    */
  private def implicitSolveCte(
      name: String,
      fixedCte: String,
      fixedKey: String,
      solveKey: String): String =
    s"""${name}_g AS (
       |  SELECT CAST(sum(f1*f1) AS BIGINT) AS g11,
       |         CAST(sum(f1*f2) AS BIGINT) AS g12,
       |         CAST(sum(f2*f2) AS BIGINT) AS g22
       |  FROM $fixedCte),
       |$name AS MATERIALIZED (
       |  SELECT $solveKey,
       |         greatest(-400, least(400, CAST(floor(
       |             (CAST(c AS DOUBLE)*CAST(d1 AS DOUBLE)
       |              - CAST(b AS DOUBLE)*CAST(d2 AS DOUBLE))
       |             / (CAST(a AS DOUBLE)*CAST(c AS DOUBLE)
       |                - CAST(b AS DOUBLE)*CAST(b AS DOUBLE))
       |             * 10000.0 + 0.5) AS BIGINT))) AS f1,
       |         greatest(-400, least(400, CAST(floor(
       |             (CAST(a AS DOUBLE)*CAST(d2 AS DOUBLE)
       |              - CAST(b AS DOUBLE)*CAST(d1 AS DOUBLE))
       |             / (CAST(a AS DOUBLE)*CAST(c AS DOUBLE)
       |                - CAST(b AS DOUBLE)*CAST(b AS DOUBLE))
       |             * 10000.0 + 0.5) AS BIGINT))) AS f2
       |  FROM (
       |    SELECT r.$solveKey,
       |           g.g11 + CAST(sum(40*r.r*f.f1*f.f1) AS BIGINT) + 1000 AS a,
       |           g.g12 + CAST(sum(40*r.r*f.f1*f.f2) AS BIGINT) AS b,
       |           g.g22 + CAST(sum(40*r.r*f.f2*f.f2) AS BIGINT) + 1000 AS c,
       |           CAST(sum((1 + 40*r.r)*f.f1) AS BIGINT) AS d1,
       |           CAST(sum((1 + 40*r.r)*f.f2) AS BIGINT) AS d2
       |    FROM capped r JOIN $fixedCte f USING ($fixedKey)
       |         CROSS JOIN ${name}_g g
       |    GROUP BY r.$solveKey, g.g11, g.g12, g.g22))""".stripMargin

  private[graft] lazy val AlsImplicitOracleSql: String =
    s"""$RatingsAndInitCtes,
       |${implicitSolveCte("us1", "it0", "item_id", "user_id")},
       |${implicitSolveCte("it2", "us1", "user_id", "item_id")},
       |${implicitSolveCte("us3", "it2", "item_id", "user_id")},
       |$RecTailSql""".stripMargin

  private[graft] lazy val AlsDetOracleSql: String =
    s"""$RatingsAndInitCtes,
       |${solveCte("us1", "it0", "item_id", "user_id")},
       |${solveCte("it2", "us1", "user_id", "item_id")},
       |${solveCte("us3", "it2", "item_id", "user_id")},
       |$RecTailSql""".stripMargin
}
