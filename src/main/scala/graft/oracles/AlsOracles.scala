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

  private[graft] lazy val AlsDetOracleSql: String =
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
       |  FROM (SELECT DISTINCT item_id FROM capped)),
       |${solveCte("us1", "it0", "item_id", "user_id")},
       |${solveCte("it2", "us1", "user_id", "item_id")},
       |${solveCte("us3", "it2", "item_id", "user_id")},
       |rec AS (
       |  SELECT u.user_id, i.item_id,
       |         u.f1*i.f1 + u.f2*i.f2 AS score,
       |         row_number() OVER (PARTITION BY u.user_id
       |           ORDER BY u.f1*i.f1 + u.f2*i.f2 DESC, i.item_id) AS rank
       |  FROM us3 u CROSS JOIN it2 i)
       |SELECT user_id, CAST(rank AS INT) AS rank, item_id,
       |       CAST(score AS BIGINT) AS score
       |FROM rec WHERE rank <= 3""".stripMargin
}
