package graft.oracles

import graft.functions.Money
import graft.oracles.SharedCtes._
import graft.oracles.StatsOracles._
import graft.oracles.SketchOracles._
import graft.oracles.VectorOracles._
import graft.oracles.TextOracles._
import graft.oracles.GraphOracles._

/** Ordered section 2/6 of the SparkEntry.oracleSql map — moved
  * verbatim (keys included) in the r18 split; SparkEntry.oracleSql
  * is the ordered concatenation of the sections.
  */
private[graft] object OracleEntriesB {
  val entries: Map[String, String] = Map(
    "q12_shipmode_priority" ->
      """SELECT l_linestatus,
        |       count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END)
        |         AS high_line_count,
        |       count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END)
        |         AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |GROUP BY l_linestatus""".stripMargin,
    "q2_min_cost_supplier" ->
      """WITH pc AS (
        |  SELECT p_partkey, p_brand, s_suppkey, s_name, n_name,
        |         min(CAST(round(l_extendedprice * 1e6) AS BIGINT)
        |             // CAST(round(l_quantity) AS BIGINT)) AS cost_micros
        |  FROM lineitem, part, supplier, nation, region
        |  WHERE p_partkey = l_partkey AND p_size < 15
        |    AND s_suppkey = l_suppkey AND n_nationkey = s_nationkey
        |    AND r_regionkey = n_regionkey AND r_name = 'EUROPE'
        |  GROUP BY 1, 2, 3, 4, 5)
        |SELECT p_partkey, p_brand, s_name, n_name AS nation, cost_micros
        |FROM (SELECT pc.*, row_number() OVER (PARTITION BY p_partkey
        |                     ORDER BY cost_micros, s_suppkey) AS rn FROM pc)
        |WHERE rn = 1""".stripMargin,
    "q9_product_profit" ->
      s"""SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
         |       ${Money.sumSql("l_extendedprice * (1 - l_discount)")} AS sum_profit
         |FROM lineitem, part, supplier, nation, orders
         |WHERE p_partkey = l_partkey AND p_name LIKE '%widget%'
         |  AND s_suppkey = l_suppkey AND n_nationkey = s_nationkey
         |  AND o_orderkey = l_orderkey
         |GROUP BY n_name, year(o_orderdate)""".stripMargin,
    "q11_important_parts" ->
      """WITH base AS (
        |  SELECT l_partkey AS p_partkey,
        |         CAST(sum(CAST(round(l_extendedprice * 1e6) AS BIGINT)) AS BIGINT)
        |           AS value_micros
        |  FROM lineitem, supplier, nation, region
        |  WHERE s_suppkey = l_suppkey AND n_nationkey = s_nationkey
        |    AND r_regionkey = n_regionkey AND r_name = 'AFRICA'
        |  GROUP BY l_partkey),
        |tot AS (SELECT CAST(sum(value_micros) AS BIGINT) AS total_micros,
        |               CAST(count(*) AS BIGINT) AS n_parts
        |        FROM base)
        |SELECT p_partkey, value_micros FROM base, tot
        |WHERE value_micros * 10 > (total_micros // n_parts) * 12""".stripMargin,
    "q16_supplier_counts" ->
      """SELECT p_brand, p_type, p_size,
        |       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem, part
        |WHERE p_partkey = l_partkey
        |  AND p_brand <> 'Brand#1'
        |  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_suppkey % 7 = 0)
        |GROUP BY 1, 2, 3""".stripMargin,
    "q20_excess_suppliers" ->
      """WITH pq AS (
        |  SELECT l_suppkey, CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty
        |  FROM lineitem, part
        |  WHERE p_partkey = l_partkey AND p_name LIKE 'small%'
        |    AND l_shipdate BETWEEN TIMESTAMP '1997-01-01 00:00:00'
        |                       AND TIMESTAMP '1997-12-31 00:00:00'
        |  GROUP BY l_suppkey),
        |tot AS (SELECT CAST(sum(qty) AS BIGINT) AS tq, CAST(count(*) AS BIGINT) AS ns
        |        FROM pq)
        |SELECT s_name, n_name AS nation
        |FROM supplier, nation
        |WHERE n_nationkey = s_nationkey
        |  AND s_suppkey IN (SELECT l_suppkey FROM pq, tot WHERE qty * 10 > (tq // ns) * 13)""".stripMargin,
    "q7_volume_shipping" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |       CAST(year(l_shipdate) AS INT) AS l_year,
         |       ${Money.sumSql("l_extendedprice * (1 - l_discount)")} AS revenue
         |FROM supplier, lineitem, orders, customer, nation n1, nation n2
         |WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
         |  AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
         |  AND c_nationkey = n2.n_nationkey
         |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
         |  AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
         |                     AND TIMESTAMP '1997-12-31 00:00:00'
         |GROUP BY n1.n_name, n2.n_name, year(l_shipdate)""".stripMargin,
    "q8_market_share" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |       round(CAST(sum(CASE WHEN n2.n_name = 'NATION_3'
        |               THEN CAST(round((l_extendedprice * (1 - l_discount)) * 1e6) AS BIGINT)
        |               ELSE 0 END) AS DOUBLE)
        |         / sum(CAST(round((l_extendedprice * (1 - l_discount)) * 1e6) AS BIGINT)), 6)
        |         AS mkt_share
        |FROM lineitem, part, orders, customer, supplier, nation n1, nation n2, region
        |WHERE l_partkey = p_partkey AND p_type = 'PROMO'
        |  AND o_orderkey = l_orderkey
        |  AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
        |                      AND TIMESTAMP '1997-12-31 00:00:00'
        |  AND c_custkey = o_custkey AND c_nationkey = n1.n_nationkey
        |  AND n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
        |  AND l_suppkey = s_suppkey AND s_nationkey = n2.n_nationkey
        |GROUP BY year(o_orderdate)""".stripMargin,
    "q13_customer_distribution" ->
      """WITH per_cust AS (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |SELECT c_count, count(*) AS custdist FROM per_cust GROUP BY c_count""".stripMargin,
    "q18_large_orders" ->
      s"""WITH big AS (
         |  SELECT l_orderkey, ${Money.sumSql("l_quantity")} AS total_qty
         |  FROM lineitem GROUP BY l_orderkey
         |  HAVING ${Money.sumSql("l_quantity")} > 150.0)
         |SELECT c_name, c_custkey, o_orderkey, o_totalprice, total_qty
         |FROM big JOIN orders ON o_orderkey = l_orderkey
         |         JOIN customer ON c_custkey = o_custkey
         |ORDER BY total_qty DESC, o_orderkey LIMIT 100""".stripMargin,
    // q17 stated with the correlated-subquery decorrelated as a grouped
    // CTE; the Spark side's window over the part-filtered selection is
    // value-identical (whole partkey groups survive the part filter)
    "q17_small_qty_revenue" ->
      s"""WITH sel AS (
         |  SELECT l_partkey, l_quantity, l_extendedprice
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE p_brand = 'Brand#4' AND p_size <= 5),
         |a AS (SELECT l_partkey, avg(l_quantity) AS avg_qty FROM sel GROUP BY l_partkey)
         |SELECT round(${Money.sumSql("l_extendedprice")} / 7.0, 2) AS avg_yearly
         |FROM sel JOIN a USING (l_partkey)
         |WHERE l_quantity < 0.2 * avg_qty""".stripMargin,
    "q19_disjunctive_revenue" ->
      s"""SELECT ${Money.sumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
         |       AND l_quantity BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20
         |       AND l_quantity BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 25
         |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q21_sole_returned_supplier" ->
      """SELECT s_name, count(*) AS numwait
        |FROM lineitem l1
        |  JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
        |  JOIN supplier ON s_suppkey = l1.l_suppkey
        |WHERE l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin,
    // threshold in exact integer micros; CAST the sum to DOUBLE before the
    // divide (a bare sum(BIGINT) is HUGEINT — the banned pandas-mangled
    // type — and BIGINT*1.0 would detour through DECIMAL)
    "q22_idle_rich_customers" ->
      s"""WITH a AS (
         |  SELECT CAST(sum(CAST(round(c_acctbal * 1e6) AS BIGINT)) AS DOUBLE)
         |           / count(*) AS avg_micros
         |  FROM customer WHERE c_acctbal > 0)
         |SELECT c_nationkey, count(*) AS n_cust,
         |       ${Money.microsToMoneySql("sum(CAST(round(c_acctbal * 1e6) AS BIGINT))")}
         |         AS total_acctbal
         |FROM customer, a
         |WHERE CAST(round(c_acctbal * 1e6) AS BIGINT) > a.avg_micros
         |  AND NOT EXISTS (SELECT 1 FROM orders o
         |                  WHERE o.o_custkey = c_custkey
         |                    AND o.o_orderpriority = '1-URGENT')
         |GROUP BY c_nationkey""".stripMargin,
    "q15_top_supplier" ->
      s"""WITH revenue AS (
         |  SELECT l_suppkey AS supplier_no,
         |         ${Money.sumSql("l_extendedprice * (1 - l_discount)")} AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, total_revenue
         |FROM supplier JOIN revenue ON s_suppkey = supplier_no
         |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)""".stripMargin,
    "q14_promo_effect" ->
      """SELECT round(100.0 *
        |         sum(CASE WHEN p_type = 'PROMO'
        |             THEN CAST(round((l_extendedprice * (1 - l_discount)) * 1e6) AS BIGINT)
        |             ELSE 0 END)
        |         / sum(CAST(round((l_extendedprice * (1 - l_discount)) * 1e6) AS BIGINT)), 6)
        |         AS promo_revenue_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate BETWEEN TIMESTAMP '1997-01-01 00:00:00'
        |                     AND TIMESTAMP '1997-12-31 00:00:00'""".stripMargin,
    "q_part_brand_stats" ->
      s"""SELECT p_brand, count(*) AS n_parts,
        |       CAST(${Money.microsSumSql("p_retailprice")} AS DOUBLE) / 1e6 / count(*)
        |         AS avg_retail,
        |       count(DISTINCT p_type) AS n_types, min(p_size) AS min_size,
        |       max(p_size) AS max_size
        |FROM part GROUP BY p_brand""".stripMargin,
    "q_customer_orders" ->
      s"""SELECT c_custkey, c_name, c_mktsegment,
        |       coalesce(o.n_orders, 0) AS n_orders,
        |       ${Money.microsToMoneySql("coalesce(o.total_spent_u, 0)")} AS total_spent
        |FROM customer LEFT JOIN (
        |  SELECT o_custkey, count(*) AS n_orders,
        |         ${Money.microsSumSql("o_totalprice")} AS total_spent_u
        |  FROM orders GROUP BY o_custkey
        |) o ON c_custkey = o_custkey""".stripMargin,
    "q_top_customers" ->
      s"""WITH top AS (
        |  SELECT c_custkey, c_name, ${Money.microsSumSql("o_totalprice")} AS rev_u,
        |         count(*) AS n_orders
        |  FROM customer JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey, c_name
        |  ORDER BY rev_u DESC, c_custkey LIMIT 10)
        |SELECT c_custkey, c_name, ${Money.microsToMoneySql("rev_u")} AS revenue, n_orders
        |FROM top""".stripMargin,
    "q_customers_without_orders" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q_building_buyers" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_mktsegment = 'BUILDING'
        |  AND EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q_segment_intersect" ->
      """SELECT c_mktsegment FROM customer WHERE c_acctbal > 5000
        |INTERSECT
        |SELECT c_mktsegment FROM customer WHERE c_acctbal < 1000""".stripMargin,
    "q_rollup_revenue" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty,
        |       count(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "q_top_order_per_customer" ->
      """WITH r AS (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |SELECT o_custkey, o_orderkey, o_totalprice FROM r WHERE rn = 1""".stripMargin,
    "q_event_gaps" ->
      """WITH g AS (
        |  SELECT user_id,
        |         CAST(floor(epoch(ts)) AS BIGINT)
        |           - lag(CAST(floor(epoch(ts)) AS BIGINT), 1)
        |             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
        |  FROM events)
        |SELECT user_id, round(avg(gap), 6) AS avg_gap_s, max(gap) AS max_gap_s,
        |       count(*) AS n_gaps
        |FROM g WHERE gap IS NOT NULL GROUP BY user_id""".stripMargin,
    "q_session_window" ->
      s"""WITH g AS (
        |  SELECT user_id, event_id, ts, value, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
        |         lag(CAST(floor(epoch(ts)) AS BIGINT), 1)
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_s
        |  FROM events
        |), m AS (
        |  SELECT *, CASE WHEN prev_s IS NULL OR ts_s - prev_s > 1800 THEN 1 ELSE 0 END AS new_s
        |  FROM g
        |), s AS (
        |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                             ROWS UNBOUNDED PRECEDING) AS session_idx
        |  FROM m)
        |SELECT user_id, min(ts_s) AS start_s, count(*) AS n_events,
        |       ${Money.sumSql("value")} AS total_value
        |FROM s GROUP BY user_id, session_idx""".stripMargin,
    "q_gap_sessions" ->
      s"""WITH g AS (
        |  SELECT user_id, event_id, ts, value, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
        |         lag(CAST(floor(epoch(ts)) AS BIGINT), 1)
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_s
        |  FROM events
        |), m AS (
        |  SELECT *, CASE WHEN prev_s IS NULL OR ts_s - prev_s > 1800 THEN 1 ELSE 0 END AS new_s
        |  FROM g
        |), s AS (
        |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                             ROWS UNBOUNDED PRECEDING) AS session_idx
        |  FROM m)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx, count(*) AS n_events,
        |       max(ts_s) - min(ts_s) AS duration_s, ${Money.sumSql("value")} AS total_value
        |FROM s GROUP BY user_id, session_idx""".stripMargin,
    // independent spelling of interval overlap: running sum over the merged
    // sorted point stream (starts count before a probe at the same value for
    // <=; ends count after a probe at the same value for <). The Spark side
    // computes the same two order statistics bucketized.
    "q_session_overlap" ->
      s"""$SessionBoundsCte,
        |p1 AS (
        |  SELECT start_s AS v, 1 AS st, CAST(NULL AS BIGINT) AS uid,
        |         CAST(NULL AS BIGINT) AS sid FROM sess
        |  UNION ALL
        |  SELECT end_s AS v, 0 AS st, user_id, session_idx FROM sess
        |), r1 AS (
        |  SELECT uid, sid, st,
        |         sum(st) OVER (ORDER BY v, st DESC ROWS UNBOUNDED PRECEDING) AS c
        |  FROM p1
        |), a AS (SELECT uid, sid, CAST(c AS BIGINT) AS n_start_le FROM r1 WHERE st = 0),
        |p2 AS (
        |  SELECT end_s AS v, 1 AS en, CAST(NULL AS BIGINT) AS uid,
        |         CAST(NULL AS BIGINT) AS sid FROM sess
        |  UNION ALL
        |  SELECT start_s AS v, 0 AS en, user_id, session_idx FROM sess
        |), r2 AS (
        |  SELECT uid, sid, en,
        |         sum(en) OVER (ORDER BY v, en ASC ROWS UNBOUNDED PRECEDING) AS c
        |  FROM p2
        |), b AS (SELECT uid, sid, CAST(c AS BIGINT) AS n_end_lt FROM r2 WHERE en = 0)
        |SELECT a.uid AS user_id, a.sid AS session_idx,
        |       CAST(a.n_start_le - b.n_end_lt - 1 AS BIGINT) AS n_overlap
        |FROM a JOIN b ON a.uid = b.uid AND a.sid = b.sid""".stripMargin,
    // same hash-slot arithmetic as NegativeSampler: 48-bit md5 of
    // "user_slot" mod |universe|, min-slot dedupe, anti-join positives,
    // first 5 by slot
    "q_negative_samples" ->
      """WITH inter AS (
        |  SELECT DISTINCT user_id,
        |         CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS item_id
        |  FROM events WHERE regexp_extract(props, '"k": (\d+)', 1) <> ''
        |), univ AS (
        |  SELECT item_id, row_number() OVER (ORDER BY item_id) - 1 AS idx
        |  FROM (SELECT DISTINCT item_id FROM inter)
        |), n AS (SELECT count(*) AS n_items FROM univ),
        |slots AS (
        |  SELECT user_id, unnest(range(1, 11)) AS slot
        |  FROM (SELECT DISTINCT user_id FROM inter)
        |), h AS (
        |  SELECT user_id, slot,
        |         ('0x' || substring(md5(CAST(user_id AS VARCHAR) || '_'
        |                                || CAST(slot AS VARCHAR)), 1, 12))::BIGINT
        |           % n_items AS cidx
        |  FROM slots, n
        |), cand AS (
        |  SELECT h.user_id, univ.item_id, h.slot FROM h JOIN univ ON univ.idx = h.cidx
        |), ded AS (
        |  SELECT user_id, item_id, min(slot) AS slot FROM cand GROUP BY user_id, item_id
        |), neg AS (
        |  SELECT d.user_id, d.item_id, d.slot FROM ded d
        |  LEFT JOIN inter i ON i.user_id = d.user_id AND i.item_id = d.item_id
        |  WHERE i.user_id IS NULL
        |), r AS (
        |  SELECT user_id, item_id,
        |         row_number() OVER (PARTITION BY user_id ORDER BY slot, item_id) AS neg_rank
        |  FROM neg)
        |SELECT user_id, item_id, CAST(neg_rank AS BIGINT) AS neg_rank
        |FROM r WHERE neg_rank <= 5""".stripMargin,
    // unrolled power iteration over the shared edge CTE; every round
    // rounds to 9 decimals exactly as PageRank.ranks does
    "q_pagerank" -> {
      val iters = (1 to 5).map { i =>
        s"""r$i AS (
           |  SELECT bi.b AS node,
           |         round(CAST(0.15 AS DOUBLE) / (SELECT n FROM nn)
           |               + CAST(0.85 AS DOUBLE) * sum(r${i - 1}.r / deg.d), 9) AS r
           |  FROM bi JOIN r${i - 1} ON r${i - 1}.node = bi.a JOIN deg ON deg.a = bi.a
           |  GROUP BY bi.b)""".stripMargin
      }.mkString(",\n")
      s"""$EdgesCte,
         |deg AS (SELECT a, count(*) AS d FROM bi GROUP BY a),
         |nn AS (SELECT count(DISTINCT a) AS n FROM bi),
         |r0 AS (SELECT DISTINCT a AS node,
         |         round(CAST(1.0 AS DOUBLE) / (SELECT n FROM nn), 9) AS r FROM bi),
         |$iters
         |SELECT node AS doc_id, round(r, 6) AS pagerank FROM r5""".stripMargin
    },
    // seeded PPR: integer mass replay — r//d contributions (non-negative,
    // so // ≡ DIV), per-node sums CAST BIGINT before the one float op per
    // node-round (0.85·s + 0.5 floor), MATERIALIZED round-per-CTE
    "q_ppr_contamination" -> {
      val iters = (1 to 4).map { i =>
        s"""p$i AS MATERIALIZED (
           |  SELECT m.node,
           |         b2.tele + CAST(floor(CAST(0.85 AS DOUBLE)
           |             * CAST(m.s AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS r
           |  FROM (SELECT bi.b AS node,
           |               CAST(sum(p${i - 1}.r // deg.d) AS BIGINT) AS s
           |        FROM bi JOIN p${i - 1} ON p${i - 1}.node = bi.a
           |             JOIN deg ON deg.a = bi.a
           |        GROUP BY bi.b) m
           |  JOIN pbase b2 ON b2.node = m.node)""".stripMargin
      }.mkString(",\n")
      s"""$EdgesCte,
         |deg AS (SELECT a, count(*) AS d FROM bi GROUP BY a),
         |pns AS (SELECT count(DISTINCT a) AS n FROM bi WHERE a % 20 = 0),
         |pbase AS MATERIALIZED (
         |  SELECT DISTINCT a AS node,
         |         CASE WHEN a % 20 = 0
         |              THEN 150000000000 // (SELECT n FROM pns) ELSE 0 END AS tele,
         |         CASE WHEN a % 20 = 0
         |              THEN 1000000000000 // (SELECT n FROM pns) ELSE 0 END AS r0v
         |  FROM bi),
         |p0 AS (SELECT node, r0v AS r FROM pbase),
         |$iters
         |SELECT node, r AS ppr_e12 FROM p4""".stripMargin
    },
    // same integer-cents moments, identical IEEE derivation of sigma,
    // round-6 weights, floor quotas, md5-order membership
    "q_stratified_neyman" ->
      """WITH e AS (
        |  SELECT event_id, event_type,
        |         CAST(round(value * 100, 0) AS BIGINT) AS c
        |  FROM events
        |), st AS (
        |  SELECT event_type, count(*) AS n_s,
        |         CAST(sum(c) AS BIGINT) AS sy, CAST(sum(c * c) AS BIGINT) AS syy
        |  FROM e GROUP BY event_type
        |), w AS (
        |  SELECT event_type, n_s,
        |         round(n_s * sqrt(GREATEST(
        |           CASE WHEN n_s > 1
        |                THEN (CAST(syy AS DOUBLE) / n_s
        |                      - (CAST(sy AS DOUBLE) / n_s) * (CAST(sy AS DOUBLE) / n_s))
        |                     * n_s / (n_s - 1.0)
        |                ELSE CAST(0.0 AS DOUBLE) END, CAST(0.0 AS DOUBLE))), 6) AS w_s
        |  FROM st
        |), tw AS (SELECT round(sum(w_s), 6) AS w_tot FROM w),
        |q AS (
        |  SELECT w.event_type, w.n_s, w.w_s,
        |         CASE WHEN tw.w_tot > 0
        |              THEN LEAST(CAST(floor(200 * w.w_s / tw.w_tot) AS BIGINT), w.n_s)
        |              ELSE 0 END AS quota
        |  FROM w, tw
        |), r AS (
        |  SELECT event_id, event_type,
        |         row_number() OVER (PARTITION BY event_type
        |           ORDER BY ('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 12))::BIGINT,
        |                    event_id) AS samp_rank
        |  FROM e)
        |SELECT r.event_id, r.event_type, CAST(r.samp_rank AS BIGINT) AS samp_rank,
        |       CAST(q.quota AS BIGINT) AS quota
        |FROM r JOIN q ON r.event_type = q.event_type
        |WHERE r.samp_rank <= q.quota""".stripMargin,
    // quantile_cont is DuckDB's exact interpolated percentile (same
    // definition as Spark's percentile); fences round-6 on both sides
    "q_winsorize" ->
      """WITH f AS (
        |  SELECT event_type,
        |         round(quantile_cont(CAST(value AS DOUBLE), 0.01), 6) AS fence_lo,
        |         round(quantile_cont(CAST(value AS DOUBLE), 0.99), 6) AS fence_hi
        |  FROM events GROUP BY event_type
        |)
        |SELECT e.event_id, e.event_type, e.value, f.fence_lo, f.fence_hi,
        |       LEAST(GREATEST(CAST(e.value AS DOUBLE), f.fence_lo), f.fence_hi) AS clipped
        |FROM events e JOIN f ON e.event_type = f.event_type""".stripMargin,
    // quantile_cont twice (the winsorize parity), second pass over
    // |v - med| with the round-6 med; the 1.4826 consistency constant is
    // CAST AS DOUBLE (decimal-literal ban) — DECIMAL(5,4)→double equals
    // strtod here since 14826/10000.0 is correctly rounded
    "q_robust_scale" ->
      """WITH f AS (
        |  SELECT event_type,
        |         round(quantile_cont(CAST(value AS DOUBLE), 0.5), 6) AS med
        |  FROM events GROUP BY event_type
        |), f2 AS (
        |  SELECT e.event_type,
        |         round(quantile_cont(abs(CAST(e.value AS DOUBLE) - f.med), 0.5), 6)
        |           AS mad
        |  FROM events e JOIN f USING (event_type) GROUP BY e.event_type
        |)
        |SELECT e.event_id, e.event_type, e.value, f.med, f2.mad,
        |       CASE WHEN f2.mad > 0
        |            THEN round((CAST(e.value AS DOUBLE) - f.med)
        |                       / (CAST(1.4826 AS DOUBLE) * f2.mad), 6)
        |       END AS robust_z
        |FROM events e JOIN f USING (event_type) JOIN f2 USING (event_type)""".stripMargin,
    // identical rebased-x stats (round-6 BEFORE the derived arithmetic on
    // both sides), then the same closed-form slope/intercept/R2
    "q_trend_slopes" ->
      """WITH e AS (
        |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, value FROM events
        |), b AS (
        |  SELECT user_id,
        |         (ts_s - min(ts_s) OVER (PARTITION BY user_id))
        |           / CAST(3600.0 AS DOUBLE) AS x,
        |         CAST(value AS DOUBLE) AS y
        |  FROM e
        |), st AS (
        |  SELECT user_id, count(*) AS n,
        |         round(sum(x), 6) AS sx, round(sum(y), 6) AS sy,
        |         round(sum(x * y), 6) AS sxy, round(sum(x * x), 6) AS sxx,
        |         round(sum(y * y), 6) AS syy
        |  FROM b GROUP BY user_id
        |)
        |SELECT user_id, CAST(n AS BIGINT) AS n, sx, sy, sxy, sxx, syy,
        |       round(CASE WHEN n * sxx - sx * sx > 0
        |         THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END, 6) AS slope,
        |       round(CASE WHEN n * sxx - sx * sx > 0
        |         THEN (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n END, 6)
        |         AS intercept,
        |       round(CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
        |         THEN ((n * sxy - sx * sy) * (n * sxy - sx * sy))
        |              / ((n * sxx - sx * sx) * (n * syy - sy * sy)) END, 6) AS r2
        |FROM st""".stripMargin,
    // same md5-rank basket cap, then the canonical a < b pair count
    "q_copurchase" ->
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
        |)
        |SELECT a.item_id AS item_a, b.item_id AS item_b, count(*) AS n_users
        |FROM capped a JOIN capped b
        |  ON a.user_id = b.user_id AND a.item_id < b.item_id
        |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin,
    // bucket ids from identical IEEE (v-lo)/(hi-lo)*64 arithmetic; integer
    // cumsums make the CDFs exact; psi spells pG/pR with the same +eps
    // association as Drift.vsRest (1e-6 scientific literal IS a double in
    // DuckDB — the decimal-literal ban hits 0.000001, not 1e-6)
    "q_drift_by_type" ->
      s"""WITH $DriftBucketCte,
        |e AS (SELECT f.g, f.b, f.n_g, f.cnt, pb.c_all, tot.n_all,
        |        CAST(sum(f.cnt) OVER (PARTITION BY f.g ORDER BY f.b)
        |             AS BIGINT) AS cum_g,
        |        CAST(sum(pb.c_all) OVER (PARTITION BY f.g ORDER BY f.b)
        |             AS BIGINT) AS cum_all
        |      FROM f JOIN pb USING (b), tot)
        |SELECT g AS event_type, max(n_g) AS n,
        |  round(max(abs(CAST(cum_g AS DOUBLE) / n_g
        |                - CAST(cum_all - cum_g AS DOUBLE) / (n_all - n_g))), 6)
        |    AS ks_d,
        |  round(sum((CAST(cnt AS DOUBLE) / n_g + 1e-6
        |             - (CAST(c_all - cnt AS DOUBLE) / (n_all - n_g) + 1e-6))
        |            * ln((CAST(cnt AS DOUBLE) / n_g + 1e-6)
        |                 / (CAST(c_all - cnt AS DOUBLE) / (n_all - n_g) + 1e-6))), 6)
        |    AS psi
        |FROM e WHERE n_all - n_g > 0 GROUP BY g""".stripMargin,
    // the batch funnel chain again (stream/batch parity makes it the
    // oracle for the static streaming run); the times prefix serialized —
    // t-nulls only ever trail, so the filtered list IS the prefix
    "q_funnel_stream" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_ns(ts) // 1000 AS ts_us FROM events
        |), s1 AS (
        |  SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts_us END) AS t1
        |  FROM e GROUP BY user_id
        |), s2 AS (
        |  SELECT e.user_id, s1.t1,
        |         min(CASE WHEN e.event_type = 'click' AND e.ts_us >= s1.t1
        |                  THEN e.ts_us END) AS t2
        |  FROM e JOIN s1 ON e.user_id = s1.user_id GROUP BY e.user_id, s1.t1
        |), s3 AS (
        |  SELECT e.user_id, s2.t1, s2.t2,
        |         min(CASE WHEN e.event_type = 'purchase' AND e.ts_us >= s2.t2
        |                  THEN e.ts_us END) AS t3
        |  FROM e JOIN s2 ON e.user_id = s2.user_id GROUP BY e.user_id, s2.t1, s2.t2
        |)
        |SELECT user_id,
        |       array_to_string(list_filter([t1, t2, t3], x -> x IS NOT NULL), ',')
        |         AS times_str,
        |       CAST((t1 IS NOT NULL)::INT + (t2 IS NOT NULL)::INT
        |            + (t3 IS NOT NULL)::INT AS BIGINT) AS stage
        |FROM s3 WHERE t1 IS NOT NULL""".stripMargin,
    // chained conditional mins replayed as grouped passes; micros on both
    // sides (DuckDB's scan already truncated nanos -> micros)
    // SCD2: same lag-change-filter → lead-interval chain; micros time,
    // event_id tiebreak; version CAST to Spark's INT
    "q_scd2_intervals" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) // 1000 AS ts_us, event_id, event_type
        |  FROM events
        |), lagd AS (
        |  SELECT *, lag(event_type) OVER (PARTITION BY user_id
        |                                  ORDER BY ts_us, event_id) AS prev
        |  FROM e
        |), chg AS (
        |  SELECT user_id, ts_us, event_id, event_type
        |  FROM lagd WHERE prev IS NULL OR prev <> event_type
        |)
        |SELECT user_id, event_type, ts_us AS valid_from,
        |       lead(ts_us) OVER w AS valid_to,
        |       CAST(row_number() OVER w AS INT) AS version,
        |       (lead(ts_us) OVER w IS NULL) AS is_current
        |FROM chg
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)""".stripMargin,
    // triangles on the shared shingle-edge CTE: two-hop join finds each
    // a<b<c exactly once; degrees from the bidirectional list
    "q_triangle_stats" ->
      s"""$EdgesCte,
         |tri AS (
         |  SELECT ab.src AS a, ab.dst AS b, bc.dst AS c
         |  FROM e ab
         |  JOIN e bc ON ab.dst = bc.src
         |  JOIN e ac ON ac.src = ab.src AND ac.dst = bc.dst
         |), tcount AS (
         |  SELECT node, CAST(count(*) AS BIGINT) AS triangles
         |  FROM (SELECT unnest([a, b, c]) AS node FROM tri) GROUP BY node
         |), deg AS (
         |  SELECT a AS node, count(*) AS degree FROM bi GROUP BY a
         |)
         |SELECT d.node, CAST(d.degree AS BIGINT) AS degree,
         |       coalesce(t.triangles, 0) AS triangles,
         |       CASE WHEN d.degree >= 2
         |            THEN round(CAST(2.0 AS DOUBLE) * coalesce(t.triangles, 0)
         |                       / (d.degree * (d.degree - 1)), 6)
         |       END AS clustering
         |FROM deg d LEFT JOIN tcount t ON d.node = t.node""".stripMargin,
    // Markov transitions: lead over (user; ts_us, event_id) — micros on
    // both sides (nanos truncate at the DuckDB scan), integer counts,
    // probability round-6
    "q_markov_transitions" ->
      """WITH e AS (
        |  SELECT user_id, event_type AS cur, epoch_ns(ts) // 1000 AS ts_us,
        |         event_id
        |  FROM events
        |), seq AS (
        |  SELECT cur,
        |         lead(cur) OVER (PARTITION BY user_id
        |                         ORDER BY ts_us, event_id) AS next
        |  FROM e
        |), pairs AS (
        |  SELECT cur, next, count(*) AS n FROM seq
        |  WHERE next IS NOT NULL GROUP BY cur, next
        |), tot AS (
        |  SELECT cur, CAST(sum(n) AS BIGINT) AS n_from FROM pairs GROUP BY cur
        |)
        |SELECT p.cur, p.next, CAST(p.n AS BIGINT) AS n, t.n_from,
        |       round(CAST(p.n AS DOUBLE) / t.n_from, 6) AS p
        |FROM pairs p JOIN tot t ON p.cur = t.cur""".stripMargin,
    // Markov GENERATION replay: seeds (first event per user), cumulative
    // transition buckets, then the 4 unrolled inverse-CDF steps — each
    // draw the md5-48 of "g <user> <t>" mod the state's outgoing count,
    // bucketed on [lo, hi). MATERIALIZED: cum is referenced by all 4 steps
    // and each step by the next (the iterative-CTE inlining gotcha).
    "q_markov_generate" -> {
      def step(t: Int): String = {
        val h = s"('0x' || substring(md5('g ' || CAST(g.user_id AS VARCHAR) || ' $t'), 1, 12))::BIGINT"
        s"""g$t AS MATERIALIZED (
           |  SELECT g.user_id, c.next AS state
           |  FROM g${t - 1} g JOIN cum c ON c.cur = g.state
           |   AND $h % c.n_from >= c.lo
           |   AND $h % c.n_from < c.hi)""".stripMargin
      }
      val selects = (0 to 4).map(t =>
        s"SELECT user_id, CAST($t AS BIGINT) AS step, state FROM g$t")
        .mkString("\nUNION ALL\n")
      s"""WITH e AS (
         |  SELECT user_id, event_type, epoch_ns(ts) // 1000 AS ts_us, event_id
         |  FROM events),
         |seeds AS (
         |  SELECT user_id, event_type AS state FROM (
         |    SELECT user_id, event_type,
         |           row_number() OVER (PARTITION BY user_id
         |                              ORDER BY ts_us, event_id) AS rn
         |    FROM e) WHERE rn = 1),
         |seq AS (
         |  SELECT event_type AS cur,
         |         lead(event_type) OVER (PARTITION BY user_id
         |                                ORDER BY ts_us, event_id) AS next
         |  FROM e),
         |pairs AS (SELECT cur, next, count(*) AS n FROM seq
         |          WHERE next IS NOT NULL GROUP BY 1, 2),
         |tot AS (SELECT cur, CAST(sum(n) AS BIGINT) AS n_from FROM pairs GROUP BY 1),
         |cum AS MATERIALIZED (
         |  SELECT p.cur, p.next, t.n_from,
         |         CAST(sum(p.n) OVER (PARTITION BY p.cur ORDER BY p.next
         |              ROWS UNBOUNDED PRECEDING) - p.n AS BIGINT) AS lo,
         |         CAST(sum(p.n) OVER (PARTITION BY p.cur ORDER BY p.next
         |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS hi
         |  FROM pairs p JOIN tot t ON t.cur = p.cur),
         |g0 AS MATERIALIZED (SELECT user_id, state FROM seeds),
         |${(1 to 4).map(step).mkString(",\n")}
         |$selects""".stripMargin
    },
    // systematic PPS replay: md5 order, windowed running weight (CAST —
    // the HUGEINT gotcha), 1-row step/offset probe, threshold-count
    // difference with the c > offset guard so every // sees non-negative
    // operands (DIV ≡ //)
    "q_pps_sample" ->
      """WITH k AS (
        |  SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
        |         md5(CAST(doc_id AS VARCHAR)) AS ord
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, w,
        |         CAST(sum(w) OVER (ORDER BY ord, doc_id
        |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM k),
        |t AS (SELECT CAST(sum(w) AS BIGINT) AS tw,
        |             CAST(sum(w) AS BIGINT) // 100 AS step FROM k),
        |t2 AS (SELECT step, step // 2 AS off FROM t WHERE step >= 1),
        |h AS (
        |  SELECT doc_id, w, cum,
        |         CAST((CASE WHEN cum > off THEN (cum - off + step - 1) // step ELSE 0 END)
        |            - (CASE WHEN cum - w > off THEN (cum - w - off + step - 1) // step
        |                    ELSE 0 END) AS BIGINT) AS n_hits
        |  FROM c CROSS JOIN t2)
        |SELECT doc_id, w, cum, n_hits FROM h WHERE n_hits >= 1""".stripMargin,
    // Markov entropy: exact n/n_from ratios inside -(p·ln p), sum round-6
    "q_markov_entropy" ->
      """WITH e AS (
        |  SELECT user_id, event_type AS cur, epoch_ns(ts) // 1000 AS ts_us,
        |         event_id
        |  FROM events
        |), seq AS (
        |  SELECT cur,
        |         lead(cur) OVER (PARTITION BY user_id
        |                         ORDER BY ts_us, event_id) AS next
        |  FROM e
        |), pairs AS (
        |  SELECT cur, next, count(*) AS n FROM seq
        |  WHERE next IS NOT NULL GROUP BY cur, next
        |), tot AS (
        |  SELECT cur, CAST(sum(n) AS BIGINT) AS n_from FROM pairs GROUP BY cur
        |)
        |SELECT t.cur, t.n_from,
        |       round(sum(-((CAST(p.n AS DOUBLE) / t.n_from)
        |                   * ln(CAST(p.n AS DOUBLE) / t.n_from))), 6) AS entropy
        |FROM pairs p JOIN tot t ON p.cur = t.cur
        |GROUP BY t.cur, t.n_from""".stripMargin,
    // seasonal decomposition: centered 24-row MA (12 preceding / 11
    // following) — NO float is ever aggregated: lossless integer micros,
    // exact window/group sums, identical final divisions, floor rounds
    "q_seasonal_decompose" ->
      """WITH series AS (
        |  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h,
        |         round(avg(value), 6) AS v
        |  FROM events GROUP BY h
        |), vi AS (
        |  SELECT h, v,
        |         CAST(round(v * CAST(1000000.0 AS DOUBLE)) AS BIGINT) AS vim
        |  FROM series
        |), t AS (
        |  SELECT h, v, vim,
        |         CASE WHEN count(vim) OVER w = 24
        |              THEN CAST(sum(vim) OVER w AS BIGINT)
        |         END AS tsum,
        |         h % 24 AS phase
        |  FROM vi
        |  WINDOW w AS (ORDER BY h ROWS BETWEEN 12 PRECEDING AND 11 FOLLOWING)
        |), t2 AS (
        |  SELECT h, v, phase, tsum,
        |         floor(CAST(tsum AS DOUBLE) / CAST(24000000.0 AS DOUBLE)
        |               * CAST(1000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE))
        |           / CAST(1000000.0 AS DOUBLE) AS trend,
        |         24 * vim - tsum AS det
        |  FROM t
        |), seas AS (
        |  SELECT phase,
        |         floor(CAST(sum(det) AS DOUBLE)
        |               / (count(*) * CAST(24000000.0 AS DOUBLE))
        |               * CAST(1000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE))
        |           / CAST(1000000.0 AS DOUBLE) AS seasonal
        |  FROM t2 WHERE tsum IS NOT NULL GROUP BY phase
        |)
        |SELECT t2.h, t2.phase, t2.v, t2.trend, s.seasonal,
        |       floor((t2.v - t2.trend - s.seasonal) * CAST(1000000.0 AS DOUBLE)
        |             + CAST(0.5 AS DOUBLE)) / CAST(1000000.0 AS DOUBLE) AS resid
        |FROM t2 LEFT JOIN seas s ON t2.phase = s.phase""".stripMargin,
    // cohort retention: DISTINCT (user, day) replaces the collect_set fold;
    // counts exact integers, ratio round-6 on both engines
    "q_cohort_retention" ->
      """WITH p AS (
        |  SELECT DISTINCT user_id AS u,
        |         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS period
        |  FROM events
        |), c AS (
        |  SELECT u, min(period) AS cohort FROM p GROUP BY u
        |), o AS (
        |  SELECT p.u, c.cohort, p.period - c.cohort AS period_offset
        |  FROM p JOIN c ON p.u = c.u
        |), cells AS (
        |  SELECT cohort, period_offset, count(*) AS n_active
        |  FROM o GROUP BY cohort, period_offset
        |), sized AS (
        |  SELECT cohort, period_offset, n_active,
        |         max(CASE WHEN period_offset = 0 THEN n_active END)
        |           OVER (PARTITION BY cohort) AS cohort_size
        |  FROM cells)
        |SELECT cohort, period_offset, CAST(n_active AS BIGINT) AS n_active,
        |       CAST(cohort_size AS BIGINT) AS cohort_size,
        |       round(CAST(n_active AS DOUBLE) / cohort_size, 6) AS retention
        |FROM sized""".stripMargin,
    // LOO target encoding: exact-integer n/Σy per category; rate and
    // smoothed rate spelled op-for-op as TargetEncode evaluates them
    "q_target_encode_loo" ->
      """WITH e AS (
        |  SELECT event_id, user_id,
        |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events
        |), g AS (
        |  SELECT user_id, count(*) AS te_n, CAST(sum(y) AS BIGINT) AS te_sum
        |  FROM e GROUP BY user_id
        |), p AS (
        |  SELECT CAST(sum(y) AS DOUBLE) / count(*) AS prior FROM e
        |)
        |SELECT e.event_id, e.user_id, CAST(e.y AS BIGINT) AS y,
        |       CAST(g.te_n AS BIGINT) AS te_n, g.te_sum,
        |       CASE WHEN g.te_n > 1
        |            THEN floor(CAST(g.te_sum - e.y AS DOUBLE) / (g.te_n - 1)
        |                       * CAST(1000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE))
        |                 / CAST(1000000.0 AS DOUBLE)
        |       END AS loo_rate,
        |       floor((g.te_sum - e.y + CAST(10.0 AS DOUBLE) * p.prior)
        |             / (g.te_n - 1 + CAST(10.0 AS DOUBLE))
        |             * CAST(1000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE))
        |         / CAST(1000000.0 AS DOUBLE) AS loo_smoothed
        |FROM e JOIN g ON e.user_id = g.user_id CROSS JOIN p""".stripMargin,
    "q_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_ns(ts) // 1000 AS ts_us FROM events
        |), s1 AS (
        |  SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts_us END) AS t1
        |  FROM e GROUP BY user_id
        |), s2 AS (
        |  SELECT e.user_id, s1.t1,
        |         min(CASE WHEN e.event_type = 'click' AND e.ts_us >= s1.t1
        |                  THEN e.ts_us END) AS t2
        |  FROM e JOIN s1 ON e.user_id = s1.user_id GROUP BY e.user_id, s1.t1
        |), s3 AS (
        |  SELECT e.user_id, s2.t1, s2.t2,
        |         min(CASE WHEN e.event_type = 'purchase' AND e.ts_us >= s2.t2
        |                  THEN e.ts_us END) AS t3
        |  FROM e JOIN s2 ON e.user_id = s2.user_id GROUP BY e.user_id, s2.t1, s2.t2
        |)
        |SELECT user_id, CAST(t1 AS BIGINT) AS t_step1, CAST(t2 AS BIGINT) AS t_step2,
        |       CAST(t3 AS BIGINT) AS t_step3,
        |       (t1 IS NOT NULL)::INT + (t2 IS NOT NULL)::INT + (t3 IS NOT NULL)::INT
        |         AS stage,
        |       CAST(t2 - t1 AS BIGINT) AS us_view_to_click,
        |       CAST(t3 - t2 AS BIGINT) AS us_click_to_purchase
        |FROM s3""".stripMargin,
    // identical frame spelling; flag from round-6 z on both sides so the
    // |z| > 3 boundary can't flip on a last-ulp stddev difference
    "q_anomaly_zscore" ->
      """WITH e AS (
        |  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h FROM events
        |), a AS (
        |  SELECT event_type, h, count(*) AS n_events FROM e GROUP BY 1, 2
        |), s AS (
        |  SELECT event_type, h, n_events,
        |         count(n_events) OVER w AS trailing_n,
        |         avg(n_events) OVER w AS trailing_mean,
        |         stddev_samp(n_events) OVER w AS trailing_std
        |  FROM a WINDOW w AS (PARTITION BY event_type ORDER BY h
        |                      ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
        |), z AS (
        |  SELECT event_type, h, n_events, trailing_n, trailing_mean, trailing_std,
        |         CASE WHEN trailing_n >= 12 AND trailing_std > 0
        |              THEN (n_events - trailing_mean) / trailing_std END AS z
        |  FROM s)
        |SELECT event_type, CAST(h AS BIGINT) AS h, CAST(n_events AS BIGINT) AS n_events,
        |       CAST(trailing_n AS BIGINT) AS trailing_n,
        |       round(trailing_mean, 6) AS trailing_mean,
        |       round(trailing_std, 6) AS trailing_std,
        |       round(z, 6) AS z,
        |       COALESCE(abs(round(z, 6)) > 3.0, FALSE) AS is_anomaly
        |FROM z""".stripMargin,
    // IDCG replayed as the same left fold (list_reduce needs the 0.0 seed
    // prepended — no init arg in DuckDB 1.0); every float output round-6
    "q_ranking_metrics" ->
      """WITH inter AS (
        |  SELECT user_id, event_type,
        |         CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS item_id
        |  FROM events WHERE regexp_extract(props, '"k": (\d+)', 1) <> ''
        |), cnt AS (
        |  SELECT user_id, item_id, count(*) AS n FROM inter GROUP BY 1, 2
        |), rk AS (
        |  SELECT user_id, item_id,
        |         row_number() OVER (PARTITION BY user_id ORDER BY n DESC, item_id) AS rank
        |  FROM cnt
        |), rel AS (
        |  SELECT DISTINCT user_id, item_id FROM inter WHERE event_type = 'purchase'
        |), nr AS (SELECT user_id, count(*) AS n_rel FROM rel GROUP BY 1),
        |h AS (
        |  SELECT r.user_id,
        |         sum(CASE WHEN rel.item_id IS NOT NULL THEN 1 ELSE 0 END) AS hits,
        |         min(CASE WHEN rel.item_id IS NOT NULL THEN r.rank END) AS first_hit,
        |         sum(CASE WHEN rel.item_id IS NOT NULL
        |                  THEN CAST(1.0 AS DOUBLE) / log2(r.rank + 1)
        |                  ELSE CAST(0.0 AS DOUBLE) END) AS dcg
        |  FROM rk r LEFT JOIN rel ON r.user_id = rel.user_id AND r.item_id = rel.item_id
        |  WHERE r.rank <= 10
        |  GROUP BY r.user_id
        |), m AS (
        |  SELECT nr.user_id, nr.n_rel,
        |         COALESCE(h.hits, 0) AS hits,
        |         CAST(COALESCE(h.hits, 0) AS DOUBLE) / nr.n_rel AS recall_raw,
        |         COALESCE(CAST(1.0 AS DOUBLE) / h.first_hit, CAST(0.0 AS DOUBLE)) AS mrr_raw,
        |         COALESCE(h.dcg, CAST(0.0 AS DOUBLE))
        |           / list_reduce(
        |               list_prepend(CAST(0.0 AS DOUBLE),
        |                 list_transform(range(1, least(10, nr.n_rel) + 1),
        |                   i -> CAST(1.0 AS DOUBLE) / log2(i + 1))),
        |               (a, x) -> a + x) AS ndcg_raw
        |  FROM nr LEFT JOIN h ON nr.user_id = h.user_id
        |)
        |SELECT user_id, CAST(n_rel AS BIGINT) AS n_rel, CAST(hits AS BIGINT) AS hits,
        |       round(recall_raw, 6) AS recall_at_k,
        |       round(mrr_raw, 6) AS mrr,
        |       round(ndcg_raw, 6) AS ndcg_at_k
        |FROM m""".stripMargin,
    // scalable twin: identical slot arithmetic; the universe index is the
    // bucketed one — row_number over (md5_48 % 64, md5_48, item) replays
    // offset + within-bucket rank exactly
    "q_negative_samples_scalable" ->
      """WITH inter AS (
        |  SELECT DISTINCT user_id,
        |         CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS item_id
        |  FROM events WHERE regexp_extract(props, '"k": (\d+)', 1) <> ''
        |), ih AS (
        |  SELECT item_id,
        |         ('0x' || substring(md5(CAST(item_id AS VARCHAR)), 1, 12))::BIGINT AS h
        |  FROM (SELECT DISTINCT item_id FROM inter)
        |), univ AS (
        |  SELECT item_id, row_number() OVER (ORDER BY h % 64, h, item_id) - 1 AS idx
        |  FROM ih
        |), n AS (SELECT count(*) AS n_items FROM univ),
        |slots AS (
        |  SELECT user_id, unnest(range(1, 11)) AS slot
        |  FROM (SELECT DISTINCT user_id FROM inter)
        |), h AS (
        |  SELECT user_id, slot,
        |         ('0x' || substring(md5(CAST(user_id AS VARCHAR) || '_'
        |                                || CAST(slot AS VARCHAR)), 1, 12))::BIGINT
        |           % n_items AS cidx
        |  FROM slots, n
        |), cand AS (
        |  SELECT h.user_id, univ.item_id, h.slot FROM h JOIN univ ON univ.idx = h.cidx
        |), ded AS (
        |  SELECT user_id, item_id, min(slot) AS slot FROM cand GROUP BY user_id, item_id
        |), neg AS (
        |  SELECT d.user_id, d.item_id, d.slot FROM ded d
        |  LEFT JOIN inter i ON i.user_id = d.user_id AND i.item_id = d.item_id
        |  WHERE i.user_id IS NULL
        |), r AS (
        |  SELECT user_id, item_id,
        |         row_number() OVER (PARTITION BY user_id ORDER BY slot, item_id) AS neg_rank
        |  FROM neg)
        |SELECT user_id, item_id, CAST(neg_rank AS BIGINT) AS neg_rank
        |FROM r WHERE neg_rank <= 5""".stripMargin,
    "q_event_sessions" ->
      s"""$SessionBoundsCte
        |SELECT e.event_id, e.user_id, s.session_idx
        |FROM (SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
        |      FROM events) e
        |JOIN sess s ON e.user_id = s.user_id
        |           AND e.ts_s BETWEEN s.start_s AND s.end_s""".stripMargin,
    // the naive BETWEEN spelling IS the oracle — DuckDB can afford it at
    // verify scale; the Spark side must produce identical pairs from the
    // bucketized equi-join
    "q_range_join" ->
      s"""$SessionBoundsCte,
        |marks AS (SELECT DISTINCT (start_s // 3600) * 3600 AS mark_s FROM sess)
        |SELECT m.mark_s, s.user_id, s.session_idx
        |FROM marks m JOIN sess s ON m.mark_s BETWEEN s.start_s AND s.end_s""".stripMargin,
    // linear interpolation: same spine as q_gap_fill; pv/pb from the
    // backward IGNORE NULLS window, nv/nb forward; the interp expression
    // is spelled op-for-op as Densify.interpolate evaluates it
    "q_interpolate" ->
      """WITH hourly AS (
        |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h,
        |         round(avg(value), 6) AS v
        |  FROM events GROUP BY user_id, h
        |), bounds AS (
        |  SELECT user_id, min(h) AS lo, max(h) AS hi FROM hourly GROUP BY user_id
        |), spine AS (
        |  SELECT user_id, unnest(range(lo, hi + 1)) AS h FROM bounds
        |), j AS (
        |  SELECT s.user_id, s.h, hr.v
        |  FROM spine s LEFT JOIN hourly hr
        |    ON s.user_id = hr.user_id AND s.h = hr.h
        |), m AS (
        |  SELECT user_id, h, v,
        |         last_value(v IGNORE NULLS) OVER wb AS pv,
        |         last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
        |           OVER wb AS pb,
        |         first_value(v IGNORE NULLS) OVER wf AS nv,
        |         first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
        |           OVER wf AS nb
        |  FROM j
        |  WINDOW wb AS (PARTITION BY user_id ORDER BY h
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         wf AS (PARTITION BY user_id ORDER BY h
        |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |)
        |SELECT user_id, h, v,
        |       floor((CASE WHEN v IS NOT NULL THEN v
        |                   WHEN pv IS NOT NULL AND nv IS NOT NULL
        |                   THEN pv + (nv - pv) * (CAST(h - pb AS DOUBLE) / (nb - pb))
        |              END) * CAST(1000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE))
        |         / CAST(1000000.0 AS DOUBLE) AS v_interp
        |FROM m""".stripMargin,
  )
}
