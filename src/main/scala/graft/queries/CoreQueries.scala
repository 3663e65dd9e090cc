package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.{t, registerAll}

/** Core relational surface — the queries the reference can only answer by
  * delegating to DuckDB (`sql_client.py:142-146`, `tests/test_dataset.py`)
  * re-expressed natively on Spark.
  *
  * Two styles on purpose:
  *  - `shared`: one ANSI SQL text executed verbatim by BOTH Spark SQL and
  *    the DuckDB oracle — demonstrates the delegated-SQL parity surface.
  *  - `dfApi`: idiomatic DataFrame/Dataset implementations (what a Spark
  *    user would write) with a separate equivalent oracle SQL.
  *
  * All money aggregates are ROUNDed to 2 decimals and CAST on both sides so
  * double summation order (Spark partial aggregation vs DuckDB) cannot flip
  * the hash compare. Timestamps are reduced to DATE / month strings before
  * being returned, so parquet tz-annotation differences don't matter.
  */
object CoreQueries {

  /** SQL run identically in Spark and DuckDB (dialect-common subset). */
  val shared: Map[String, String] = Map(
    // TPC-H Q1-style pricing summary: scan + filter + hash agg
    // (partial+final map-side combine is automatic in Spark).
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_disc_price,
        |  CAST(ROUND(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) * (1 + CAST(l_tax AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_charge,
        |  CAST(ROUND(AVG(l_quantity), 2) AS DOUBLE) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    // The reference's own flagship SQL test (tests/test_dataset.py:215-221):
    // join + group-by + order-by.
    "q3_join_agg" ->
      """SELECT c.c_name AS c_name,
        |  CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_amount
        |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        |GROUP BY c.c_name
        |ORDER BY c.c_name""".stripMargin,

    // 4-way join up the dimension chain; small dims get broadcast by AQE.
    "q4_region_revenue" ->
      """SELECT r.r_name AS r_name, COUNT(*) AS n_orders,
        |  CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue
        |FROM region r
        |JOIN nation n ON n.n_regionkey = r.r_regionkey
        |JOIN customer c ON c.c_nationkey = n.n_nationkey
        |JOIN orders o ON o.o_custkey = c.c_custkey
        |GROUP BY r.r_name""".stripMargin,

    // GROUP BY + HAVING
    "q12_having" ->
      """SELECT o_custkey, COUNT(*) AS n_orders
        |FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 3""".stripMargin,

    // temporal bucketing (month) — mirrors the `month` partition transform
    // family (partition_builder.py:259-266) as a query.
    "q13_month_agg" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
        |  COUNT(*) AS n_orders,
        |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue
        |FROM orders GROUP BY CAST(date_trunc('month', o_orderdate) AS DATE)""".stripMargin,

    // CASE expression + conditional aggregation
    "q14_case_bucket" ->
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
        |            WHEN o_totalprice < 200000 THEN 'medium'
        |            ELSE 'large' END AS bucket,
        |  COUNT(*) AS n,
        |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue
        |FROM orders
        |GROUP BY CASE WHEN o_totalprice < 50000 THEN 'small'
        |              WHEN o_totalprice < 200000 THEN 'medium'
        |              ELSE 'large' END""".stripMargin,

    // event-time daily rollup over the ns-precision stream table
    "q15_events_daily" ->
      """SELECT event_type, CAST(ts AS DATE) AS event_day, COUNT(*) AS n,
        |  CAST(ROUND(SUM(value), 2) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type, CAST(ts AS DATE)""".stripMargin,

    // scalar subquery
    "q17_above_avg" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)""".stripMargin,

    // ROLLUP hierarchy totals (regional hierarchy with grand total)
    "q18_rollup" ->
      """SELECT n.n_name AS n_name, c.c_mktsegment AS c_mktsegment,
        |  COUNT(*) AS n_customers,
        |  CAST(ROUND(SUM(c.c_acctbal), 2) AS DOUBLE) AS total_bal
        |FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
        |GROUP BY ROLLUP (n.n_name, c.c_mktsegment)""".stripMargin,

    // string function surface
    "q19_string_funcs" ->
      """SELECT p_partkey,
        |  upper(p_brand) AS brand_u,
        |  substring(p_name, 1, 5) AS name5,
        |  replace(p_type, 'A', '@') AS type_r,
        |  length(p_name) AS name_len,
        |  concat(p_brand, '/', p_type) AS brand_type
        |FROM part""".stripMargin,

    // temporal extraction surface
    "q20_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS y,
        |  CAST(month(o_orderdate) AS BIGINT) AS m,
        |  CAST(day(o_orderdate) AS BIGINT) AS d,
        |  CAST(o_orderdate AS DATE) AS od
        |FROM orders WHERE o_orderkey <= 1000""".stripMargin,

    // null-handling surface over the evolved-sparse pattern
    "q21_null_funcs" ->
      """SELECT c_custkey,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg,
        |  CASE WHEN c_acctbal IS NULL THEN -1.0 ELSE c_acctbal END AS bal
        |FROM customer""".stripMargin,

    // correlated aggregate subquery (decorrelated by Catalyst)
    "q22_correlated_agg" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
        |WHERE o_totalprice > (SELECT 2 * AVG(o2.o_totalprice) FROM orders o2
        |                      WHERE o2.o_custkey = o.o_custkey)""".stripMargin,

    // CUBE: all grouping combinations of two keys
    "q32_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,

    // GROUPING SETS (finer than ROLLUP: two independent grouping keys)
    "q23_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin,

    // INTERSECT set op (customers that order AND supply nations intersect)
    "q24_intersect" ->
      """SELECT c_nationkey AS nk FROM customer
        |INTERSECT SELECT s_nationkey AS nk FROM supplier""".stripMargin,

    // interval (range) self-join: event pairs of the same user within one
    // hour — equi-key + range predicate; second-truncated timestamps keep
    // the ns-vs-us precision of the two engines equal at the boundary
    "q26_range_join" ->
      """SELECT a.event_id AS a_id, b.event_id AS b_id
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND date_trunc('second', b.ts) > date_trunc('second', a.ts)
        | AND date_trunc('second', b.ts) <=
        |     date_trunc('second', a.ts) + INTERVAL '1' HOUR""".stripMargin,

    // TPC-H Q3 shape: shipping priority — segment-filtered 3-way join,
    // revenue agg, deterministic top-10
    // exact DECIMAL revenue (q31 precedent): double sums are
    // order-dependent and this query's LIMIT boundary rides on them
    "q28_tpch3_shipping" ->
      """SELECT l.l_orderkey,
        |  CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
        |    (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE)
        |    AS revenue,
        |  CAST(o.o_orderdate AS DATE) AS orderdate
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l.l_orderkey, CAST(o.o_orderdate AS DATE)
        |ORDER BY revenue DESC, l.l_orderkey LIMIT 10""".stripMargin,

    // TPC-H Q5 shape: local-supplier volume — 6-way join through both
    // customer and supplier back to the same nation
    "q29_tpch5_local" ->
      """SELECT n.n_name AS n_name,
        |  CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE)
        |    AS revenue
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  AND c.c_nationkey = s.s_nationkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY n.n_name""".stripMargin,

    // TPC-H Q7 shape: volume shipping between two nations by year.
    // q49 DECIMAL pattern: the sum is exact (order-independent), so the
    // final double round sees bit-identical input on both engines — no
    // epsilon.
    "q30_tpch7_volume" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |  CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
        |  CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
        |    (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE)
        |    AS volume
        |FROM supplier s
        |JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        |JOIN orders o ON o.o_orderkey = l.l_orderkey
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        |JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        |WHERE sn.n_name <> cn.n_name
        |GROUP BY sn.n_name, cn.n_name, year(l.l_shipdate)""".stripMargin,

    // TPC-H Q10 shape: returned-item reporting, top-20 customers
    // exact DECIMAL product/sum (the q49/w11 precedent): a double SUM is
    // order-dependent, and at sf10 two customers tie at the LIMIT-20
    // boundary within FP noise, flipping rank 20/21 between engines
    "q31_tpch10_returns" ->
      """SELECT c.c_custkey, c.c_name,
        |  CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
        |    (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE)
        |    AS revenue,
        |  CAST(ROUND(c.c_acctbal, 2) AS DOUBLE) AS c_acctbal
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE l.l_returnflag = 'R'
        |GROUP BY c.c_custkey, c.c_name, c.c_acctbal
        |ORDER BY revenue DESC, c.c_custkey LIMIT 20""".stripMargin,

    // TPC-H Q12 shape: priority-class buckets per line status (the test
    // tables carry no shipmode/commitdate, so the two-class CASE runs on
    // o_orderpriority; the join/agg/bucket structure is Q12's)
    "q35_tpch12_priority" ->
      """SELECT l.l_linestatus,
        |  CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l.l_linestatus""".stripMargin,

    // TPC-H Q18 shape: large-quantity orders — HAVING subquery feeding a
    // 3-way join + top-N
    "q36_tpch18_large_orders" ->
      """SELECT c.c_name, c.c_custkey, o.o_orderkey,
        |  CAST(o.o_orderdate AS DATE) AS orderdate,
        |  CAST(ROUND(o.o_totalprice, 2) AS DOUBLE) AS totalprice,
        |  CAST(SUM(l.l_quantity) AS BIGINT) AS sum_qty
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |WHERE o.o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY l_orderkey HAVING SUM(l_quantity) > 250)
        |GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
        |ORDER BY totalprice DESC, o.o_orderkey LIMIT 50""".stripMargin,

    // TPC-H Q14 shape: promotion revenue share over a month window.
    // The q49 DECIMAL pattern: both sums are exact decimals (order-
    // independent, bit-identical on both engines), so the final double
    // division and round see identical inputs — no epsilon needed.
    "q37_tpch14_promo" ->
      """SELECT CAST(ROUND(100.0 *
        |    CAST(SUM(val * (CASE WHEN promo THEN 1 ELSE 0 END)) AS DOUBLE) /
        |    CAST(SUM(val) AS DOUBLE), 2) AS DOUBLE)
        |  AS promo_revenue
        |FROM (SELECT CAST(l.l_extendedprice AS DECIMAL(18,2)) *
        |        (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS val,
        |        p.p_type LIKE 'PROMO%' AS promo
        |      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |      WHERE l.l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
        |        AND l.l_shipdate < TIMESTAMP '1997-04-01 00:00:00') t""".stripMargin,

    // TPC-H Q4 shape: order-priority counts gated on a lineitem EXISTS
    // (the test tables carry no commitdate/receiptdate, so the existence
    // probe is shipped-after-order; the semi-join structure is Q4's)
    "q38_tpch4_priority" ->
      """SELECT o.o_orderpriority, COUNT(*) AS order_count
        |FROM orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
        |GROUP BY o.o_orderpriority""".stripMargin,

    // TPC-H Q6 shape: forecast revenue change — pure scan + predicate +
    // single agg (the canonical pushdown/codegen microbenchmark)
    "q39_tpch6_forecast" ->
      """SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE)
        |    AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.04 AND 0.08
        |  AND l_quantity < 24""".stripMargin,

    // TPC-H Q13 shape: customer order-count distribution (LEFT JOIN
    // preserving order-less customers, two-level aggregation)
    "q40_tpch13_custdist" ->
      """SELECT c_count, COUNT(*) AS custdist
        |FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        |      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |      GROUP BY c.c_custkey) t
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    // TPC-H Q19 shape: disjunctive bracket predicates across the join —
    // the optimizer must keep the join filter despite the OR tree
    "q41_tpch19_brackets" ->
      """SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE)
        |    AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE (p.p_brand = 'Brand#12' AND l.l_quantity BETWEEN 1 AND 11
        |       AND p.p_size BETWEEN 1 AND 15)
        |   OR (p.p_brand = 'Brand#23' AND l.l_quantity BETWEEN 10 AND 20
        |       AND p.p_size BETWEEN 1 AND 25)
        |   OR (p.p_brand = 'Brand#34' AND l.l_quantity BETWEEN 20 AND 30
        |       AND p.p_size BETWEEN 1 AND 35)""".stripMargin,

    // TPC-H Q22 shape: wealthy customers who never ordered — scalar
    // subquery threshold + anti-join, grouped by nation
    "q42_tpch22_idle_rich" ->
      """SELECT c.c_nationkey, COUNT(*) AS numcust,
        |  CAST(ROUND(SUM(c.c_acctbal), 2) AS DOUBLE) AS totacctbal
        |FROM customer c
        |WHERE c.c_acctbal > (SELECT AVG(c_acctbal) FROM customer
        |                     WHERE c_acctbal > 0.0)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_totalprice > 400000)
        |GROUP BY c.c_nationkey
        |ORDER BY c.c_nationkey""".stripMargin,

    // TPC-H Q15 shape: top supplier by quarterly revenue — CTE reused by
    // both the join and the MAX scalar subquery
    "q43_tpch15_top_supplier" ->
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE)
        |      AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s.s_suppkey, s.s_name, r.total_revenue
        |FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
        |WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        |ORDER BY s.s_suppkey""".stripMargin,

    // TPC-H Q8 shape: one nation's market share inside a region by order
    // year — an 8-way join feeding a conditional-ratio aggregate. Exact
    // decimal sums (q49 pattern), double division only at the end — no
    // epsilon.
    "q44_tpch8_market_share" ->
      """SELECT o_year,
        |  CAST(ROUND(
        |    CAST(SUM(volume * (CASE WHEN nation = 'NATION_7' THEN 1 ELSE 0 END))
        |      AS DOUBLE)
        |    / CAST(SUM(volume) AS DOUBLE), 4) AS DOUBLE) AS mkt_share
        |FROM (SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
        |        CAST(l.l_extendedprice AS DECIMAL(18,2)) *
        |          (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume,
        |        sn.n_name AS nation
        |      FROM lineitem l
        |      JOIN part p ON p.p_partkey = l.l_partkey
        |      JOIN orders o ON o.o_orderkey = l.l_orderkey
        |      JOIN customer c ON c.c_custkey = o.o_custkey
        |      JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        |      JOIN region r ON cn.n_regionkey = r.r_regionkey
        |      JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |      JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        |      WHERE r.r_name = 'EUROPE' AND p.p_type = 'STANDARD') t
        |GROUP BY o_year
        |ORDER BY o_year""".stripMargin,

    // TPC-H Q21 shape: suppliers who were the ONLY late supplier of a
    // finalized multi-supplier order — correlated EXISTS + NOT EXISTS
    // over the same fact table (the test tables carry no receipt/commit
    // dates, so "late" is shipped > 30 days after the order date)
    "q45_tpch21_waiting" ->
      """SELECT s.s_name, COUNT(*) AS numwait
        |FROM supplier s
        |JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
        |JOIN orders o ON o.o_orderkey = l1.l_orderkey
        |WHERE o.o_orderstatus = 'F'
        |  AND l1.l_shipdate > o.o_orderdate + INTERVAL '30' DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > o.o_orderdate + INTERVAL '30' DAY)
        |GROUP BY s.s_name
        |ORDER BY numwait DESC, s.s_name
        |LIMIT 20""".stripMargin,

    // TPC-H Q2 shape: cheapest supplier per part in a region — correlated
    // MIN subquery repeating the region restriction (the test tables have
    // no partsupp, so lineitem serves as the part-supplier cost relation;
    // DISTINCT collapses equal-price repeat shipments). Catalyst rewrites
    // the correlated aggregate into a grouped min + join.
    "q47_tpch2_min_cost" ->
      """SELECT DISTINCT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_type
        |FROM part p
        |JOIN lineitem l ON l.l_partkey = p.p_partkey
        |JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |JOIN nation n ON n.n_nationkey = s.s_nationkey
        |JOIN region r ON r.r_regionkey = n.n_regionkey
        |WHERE p.p_size BETWEEN 10 AND 20 AND r.r_name = 'EUROPE'
        |  AND l.l_extendedprice = (
        |    SELECT MIN(l2.l_extendedprice)
        |    FROM lineitem l2
        |    JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
        |    JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
        |    JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
        |    WHERE l2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
        |ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
        |LIMIT 100""".stripMargin,

    // TPC-H Q9 shape: profit by supplier nation and order year over a
    // part-name LIKE slice (supplycost stands in as a retailprice
    // fraction — no partsupp table); 5-way join + two-level group-by
    // (per-row amounts quantize to integer cents via FLOOR(x*100 + 0.5):
    // both engines evaluate the same IEEE double expression bit-for-bit,
    // so the floor — unlike ROUND, whose half-way convention differs — is
    // deterministic, and the BIGINT sum is order-insensitive; the plain
    // ROUND(SUM(..), 2) version flipped by a cent between Spark and DuckDB)
    "q48_tpch9_profit" ->
      """SELECT nation, o_year,
        |  CAST(SUM(amount_cents) AS DOUBLE) / 100 AS sum_profit
        |FROM (SELECT n.n_name AS nation,
        |        CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
        |        CAST(FLOOR((l.l_extendedprice * (1 - l.l_discount)
        |          - 0.4 * p.p_retailprice * l.l_quantity) * 100 + 0.5)
        |          AS BIGINT) AS amount_cents
        |      FROM lineitem l
        |      JOIN part p ON p.p_partkey = l.l_partkey
        |      JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |      JOIN orders o ON o.o_orderkey = l.l_orderkey
        |      JOIN nation n ON n.n_nationkey = s.s_nationkey
        |      WHERE p.p_name LIKE '%gear%') profit
        |GROUP BY nation, o_year
        |ORDER BY nation, o_year DESC""".stripMargin,

    // TPC-H Q11 shape: parts whose regional revenue exceeds a global
    // scalar-subquery threshold (1.5x the mean part value keeps the
    // predicate scale-free across SFs, unlike Q11's fixed fraction).
    // Money math in DECIMAL: the inputs carry <=2 decimal digits, so the
    // products are exact at scale 4 and BOTH the threshold comparison
    // and the final 2dp round are exact in both engines — no epsilon.
    // The mean threshold is cross-multiplied (SUM*count > 1.5*total)
    // because decimal division would fall back to double in DuckDB.
    "q49_tpch11_important_parts" ->
      """WITH ps AS (
        |  SELECT l.l_partkey AS ps_partkey,
        |    CAST(l.l_extendedprice AS DECIMAL(18,2)) *
        |      (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS val
        |  FROM lineitem l
        |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |  JOIN nation n ON n.n_nationkey = s.s_nationkey
        |  JOIN region r ON r.r_regionkey = n.n_regionkey
        |  WHERE r.r_name = 'EUROPE')
        |SELECT ps_partkey, CAST(ROUND(SUM(val), 2) AS DOUBLE) AS value
        |FROM ps
        |GROUP BY ps_partkey
        |HAVING SUM(val) * (SELECT COUNT(DISTINCT ps_partkey) FROM ps)
        |     > (SELECT 1.5 * SUM(val) FROM ps)
        |ORDER BY value DESC, ps_partkey""".stripMargin,

    // TPC-H Q16 shape: distinct-supplier counts per part attribute bucket
    // with a NOT IN exclusion subquery
    "q50_tpch16_supplier_cnt" ->
      """SELECT p.p_brand, p.p_type, p.p_size,
        |  COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE p.p_brand <> 'Brand#13' AND p.p_type NOT LIKE 'MEDIUM%'
        |  AND p.p_size IN (1, 4, 7, 10, 15, 22, 25, 49)
        |  AND l.l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
        |GROUP BY p.p_brand, p.p_type, p.p_size
        |ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size""".stripMargin,

    // TPC-H Q20 shape: suppliers who shipped a large 1997 volume of a
    // part-name slice — nested IN subqueries with a grouped HAVING inside
    "q51_tpch20_promo_suppliers" ->
      """SELECT s.s_name, CAST(ROUND(s.s_acctbal, 2) AS DOUBLE) AS s_acctbal
        |FROM supplier s
        |WHERE s.s_suppkey IN (
        |  SELECT l.l_suppkey FROM lineitem l
        |  WHERE l.l_partkey IN (
        |      SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
        |    AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  GROUP BY l.l_suppkey
        |  HAVING SUM(l.l_quantity) > 50)
        |ORDER BY s.s_name""".stripMargin,

    // sessionization: 30-minute-gap sessions per user via lag + running sum
    "q27_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, date_trunc('second', ts) AS t
        |  FROM events),
        |g AS (SELECT user_id, event_id, t,
        |  CASE WHEN t > lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id)
        |              + INTERVAL '30' MINUTE
        |       THEN 1 ELSE 0 END AS brk FROM e),
        |s AS (SELECT user_id, event_id,
        |  SUM(brk) OVER (PARTITION BY user_id ORDER BY t, event_id
        |    ROWS UNBOUNDED PRECEDING) AS sid FROM g)
        |SELECT user_id, COUNT(DISTINCT sid) AS n_sessions, COUNT(*) AS n_events
        |FROM s GROUP BY user_id""".stripMargin
  )

  /** DataFrame-API implementations, each with an equivalent oracle SQL. */
  val dfApi: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    // as-of join (custom operator via composition — graft.operators.AsOfJoin):
    // each event attaches the latest order of the same user at-or-before
    // its event time; oracle is DuckDB's correlated LIMIT 1 formulation
    "q25_asof_join" -> ((
      (s: SparkSession, dir: String) => {
        val events = t(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("ts"))
        val orders = t(s, dir, "orders")
          .select(col("o_custkey").as("user_id"), col("o_orderdate"),
            col("o_orderkey"))
        graft.operators.AsOfJoin(events, orders, Seq("user_id"),
          leftTime = "ts", rightTime = "o_orderdate",
          tiebreak = "o_orderkey", payload = Seq("o_orderkey"))
          .select(col("event_id"), col("user_id"), col("o_orderkey"))
      },
      """SELECT e.event_id, e.user_id,
        |  (SELECT o.o_orderkey FROM orders o
        |   WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        |   ORDER BY o.o_orderdate DESC, o.o_orderkey DESC LIMIT 1) AS o_orderkey
        |FROM events e""".stripMargin)),
    // projection + predicate (pushed to the parquet scan by Catalyst) —
    // the reference's products query shape (tests/test_dataset.py:163-167).
    "q2_filter_project" -> ((
      (s: SparkSession, dir: String) =>
        t(s, dir, "part")
          .filter(col("p_retailprice") > 910 && col("p_type") === "STANDARD")
          .select(col("p_name"), col("p_retailprice")),
      """SELECT p_name, p_retailprice FROM part
        |WHERE p_retailprice > 910 AND p_type = 'STANDARD'""".stripMargin)),

    // window function: per-customer top-3 orders (deterministic tiebreak)
    "q5_window_topn" -> ((
      (s: SparkSession, dir: String) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
      },
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) x WHERE rn <= 3""".stripMargin)),

    // TPC-H Q17 (small-quantity-order revenue): the correlated per-part
    // average becomes a grouped aggregate computed ONLY over lineitems of
    // qualifying parts — the broadcast semi-restriction comes FIRST, so
    // at 100 TB the avg shuffle carries the filtered slice, not the whole
    // fact table (per-part averages are unaffected by the restriction)
    "q46_tpch17_small_qty" -> ((
      (s: SparkSession, dir: String) => {
        val li = t(s, dir, "lineitem")
        val smallParts = t(s, dir, "part").filter(col("p_size") <= 10)
          .select(col("p_partkey"))
        val relevant = li.join(broadcast(smallParts),
          li("l_partkey") === smallParts("p_partkey")).drop("p_partkey")
        val avgQ = relevant.groupBy("l_partkey")
          .agg(avg(col("l_quantity")).as("aq"))
        relevant.join(avgQ, "l_partkey")
          .filter(col("l_quantity") < col("aq") * 0.5)
          .agg(round(sum(col("l_extendedprice").cast("decimal(18,2)")) / 7.0, 2)
            .cast("double").as("avg_yearly"))
      },
      """SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) / 7.0, 2) AS DOUBLE) AS avg_yearly
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE p.p_size <= 10
        |  AND l.l_quantity < 0.5 * (
        |    SELECT AVG(l2.l_quantity) FROM lineitem l2
        |    WHERE l2.l_partkey = p.p_partkey)""".stripMargin)),

    // DISTINCT
    "q6_distinct" -> ((
      (s: SparkSession, dir: String) =>
        t(s, dir, "customer").select(col("c_mktsegment")).distinct(),
      "SELECT DISTINCT c_mktsegment FROM customer")),

    // ORDER BY + LIMIT with a unique tiebreak (deterministic top-k)
    "q7_topn_orders" -> ((
      (s: SparkSession, dir: String) =>
        t(s, dir, "orders")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .select(col("o_orderkey"), col("o_totalprice"))
          .limit(10),
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)),

    // UNION (set semantics = union + distinct in Spark)
    "q8_union_distinct" -> ((
      (s: SparkSession, dir: String) =>
        t(s, dir, "customer").select(col("c_nationkey").as("nk"))
          .union(t(s, dir, "supplier").select(col("s_nationkey").as("nk")))
          .distinct(),
      """SELECT c_nationkey AS nk FROM customer
        |UNION SELECT s_nationkey AS nk FROM supplier""".stripMargin)),

    // EXCEPT: customers whose max order lands in (400k, 450k]
    "q9_except" -> ((
      (s: SparkSession, dir: String) => {
        val o = t(s, dir, "orders")
        o.filter(col("o_totalprice") > 400000).select(col("o_custkey"))
          .except(o.filter(col("o_totalprice") > 450000).select(col("o_custkey")))
      },
      """SELECT o_custkey FROM orders WHERE o_totalprice > 400000
        |EXCEPT SELECT o_custkey FROM orders WHERE o_totalprice > 450000""".stripMargin)),

    // left-semi join = EXISTS probe (reference J4 `_load_record_exists`,
    // destination_client.py:1139-1150, generalized)
    "q10_semi_join" -> ((
      (s: SparkSession, dir: String) => {
        val bigOrders = t(s, dir, "orders")
          .filter(col("o_totalprice") > 300000)
          .select(col("o_custkey").as("c_custkey"))
        t(s, dir, "customer")
          .join(bigOrders, Seq("c_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"))
      },
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)""".stripMargin)),

    // left-anti join = NOT EXISTS — the core building block of the
    // delete-insert/upsert dispositions (merge_utils.py:17-42 → SURVEY J2/J3)
    "q11_anti_join" -> ((
      (s: SparkSession, dir: String) => {
        val bigOrders = t(s, dir, "orders")
          .filter(col("o_totalprice") > 350000)
          .select(col("o_custkey").as("c_custkey"))
        t(s, dir, "customer")
          .join(bigOrders, Seq("c_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
      },
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 350000)""".stripMargin)),

    // salted skew join: identical relational result to the plain join —
    // the oracle IS the unsalted formulation (graft.operators.SkewJoin)
    "q33_skew_join" -> ((
      (s: SparkSession, dir: String) => {
        val li = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_quantity"))
        val o = t(s, dir, "orders")
          .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
        graft.operators.SkewJoin.salted(li, o, Seq("l_orderkey"), factor = 8)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity")).cast("double").as("sum_qty"))
      },
      """SELECT o.o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(l.l_quantity) AS DOUBLE) AS sum_qty
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY o.o_orderstatus""".stripMargin)),

    // bucketed band join: same relation as q26 (equi-key + 1-hour band)
    // but time is part of the join key, so one power-law user's pair-space
    // is per-(user, hour-bucket), never lifetime-quadratic — the oracle IS
    // the naive band-filtered join (graft.operators.BandJoin)
    "q34_range_join_bucketed" -> ((
      (s: SparkSession, dir: String) => {
        val ev = t(s, dir, "events").select(col("user_id"),
          col("event_id"), col("ts"))
        graft.operators.BandJoin.bandPairs(ev, ev, Seq("user_id"),
          leftTs = "ts", rightTs = "ts", bandSeconds = 3600L)
          .select(col("event_id").as("a_id"), col("event_id_r").as("b_id"))
      },
      """SELECT a.event_id AS a_id, b.event_id AS b_id
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND date_trunc('second', b.ts) > date_trunc('second', a.ts)
        | AND date_trunc('second', b.ts) <=
        |     date_trunc('second', a.ts) + INTERVAL '1' HOUR""".stripMargin)),

    // IN-subquery membership (reference P4 `In(pk, values)` generalized to a
    // semi-join, which scales past expression-size limits)
    "q16_in_subquery" -> ((
      (s: SparkSession, dir: String) => {
        val building = t(s, dir, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey").as("o_custkey"))
        t(s, dir, "orders")
          .join(building, Seq("o_custkey"), "left_semi")
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("o_totalprice").cast("decimal(18,2)")), 2)
              .cast("double").as("revenue"))
      },
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue
        |FROM orders WHERE o_custkey IN
        |  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |GROUP BY o_orderstatus""".stripMargin))
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    shared.map { case (name, sql) =>
      name -> ((s: SparkSession, dir: String) => { registerAll(s, dir); s.sql(sql) })
    } ++ dfApi.map { case (name, (fn, _)) => name -> fn }

  def oracleSql: Map[String, String] =
    shared ++ dfApi.map { case (name, (_, sql)) => name -> sql }
}
