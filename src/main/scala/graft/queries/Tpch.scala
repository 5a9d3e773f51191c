package graft.queries

import graft.QueryDef
import graft.QueryDef.t

/** The COMPLETE TPC-H-shaped SQL surface: with Q3/Q5 in Relational2,
  * all 22 queries adapted to the fixture's trimmed columns — wide
  * aggregation (Q1), correlated scalar min (Q2), EXISTS decorrelation
  * (Q4), scan-filter-agg pushdown (Q6), the double-nation self-join
  * (Q7), market-share ratio (Q8), LIKE-filtered profit rollup (Q9),
  * group-per-entity revenue (Q10), HAVING-vs-scalar-subquery (Q11),
  * lateness CASE-pivot (Q12), a grouped LEFT JOIN distribution (Q13),
  * promo share (Q14), the top-supplier CTE view (Q15), distinct-count
  * distribution with NOT IN (Q16), correlated AVG (Q17), IN-subquery
  * with HAVING (Q18), disjunctive multi-column pushdown (Q19), nested
  * semi-join chain (Q20), double EXISTS/NOT EXISTS correlation (Q21),
  * and the dormant-customer anti-join (Q22). Every query is ONE
  * spark.sql() string over registered temp views, and the SAME text
  * (modulo nothing — these avoid dialect-divergent functions) runs on
  * the DuckDB oracle, so Catalyst's plan is checked end to end against
  * an independent engine.
  *
  * Numeric discipline (the suite's cross-engine float contract):
  * full-table money sums (Q1) go through the cents-integer trick —
  * `CAST(round(x * 10^k) AS BIGINT)` per row is EXACT (each product has
  * <= k decimal digits, and round() lands on an integer-representable
  * double), the BIGINT sum is exact in both engines regardless of
  * accumulation order, and the final single division by 10^k is one
  * correctly-rounded IEEE op — written `/ 1e{k}` because scientific
  * notation is DOUBLE in both engines, while `10000.0` is a DECIMAL
  * literal in DuckDB whose division rounds differently in the last ulp. Plain `round(sum(double), 2..4)` is only
  * used where groups are small enough that accumulation-order wobble
  * stays far below the rounding grain (the Q3/Q5 precedent). Averages
  * round at 6 (error is relative, ~1e-12). Quantities are integral
  * doubles -> CAST AS BIGINT is exact.
  *
  * Adaptations (fixture lacks partsupp, l_commitdate/l_receiptdate/
  * l_shipmode, p_container, c_phone): the part-supplier relation is
  * derived as DISTINCT (l_partkey, l_suppkey) from lineitem (Q2/Q16);
  * ps_supplycost-dependent terms use s_acctbal (Q2) or drop the cost
  * leg (Q9/Q11/Q20); lateness predicates are shipped-N-days-after-order
  * (Q4/Q12/Q21); Q17 filters on p_brand alone; Q22's cntrycode is
  * c_nationkey%5 and its anti-join is dated (the fixture's density gives
  * every customer orders). Shape and plan stress (decorrelation;
  * disjunctive pushdown; semi/anti-join chains) are preserved.
  * Reference for the query semantics: TPC-H spec rev 2.18 (public).
  */
object Tpch {

  private def views(
      s: org.apache.spark.sql.SparkSession,
      dir: String,
      names: String*): Unit =
    names.foreach(n => t(s, dir, n).createOrReplaceTempView(n))

  private val Q1 =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 1e2 AS sum_base_price,
      |  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000) AS BIGINT)) AS BIGINT) / 1e4 AS sum_disc_price,
      |  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) * 1000000) AS BIGINT)) AS BIGINT) / 1e6 AS sum_charge,
      |  round(avg(l_quantity), 6) AS avg_qty,
      |  round(avg(l_extendedprice), 6) AS avg_price,
      |  round(avg(l_discount), 6) AS avg_disc,
      |  CAST(count(*) AS BIGINT) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-02'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  private val Q2 =
    """SELECT s_acctbal, s_name, n_name, p_partkey, p_brand
      |FROM part
      |JOIN (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps ON p_partkey = l_partkey
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE p_size = 15 AND p_type = 'PROMO' AND r_name = 'EUROPE'
      |  AND s_acctbal = (SELECT min(s2.s_acctbal)
      |                   FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps2
      |                   JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey
      |                   JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
      |                   JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
      |                   WHERE ps2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')""".stripMargin

  private val Q4 =
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL '60' DAY)
      |GROUP BY o_orderpriority""".stripMargin

  private val Q6 =
    """SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 10000) AS BIGINT)) AS BIGINT) / 1e4 AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin

  private val Q7 =
    """SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
      |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |        year(l_shipdate) AS l_year,
      |        l_extendedprice * (1.0 - l_discount) AS volume
      |      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
      |      JOIN orders ON o_orderkey = l_orderkey
      |      JOIN customer ON c_custkey = o_custkey
      |      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |      WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      |          OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      |        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31') shipping
      |GROUP BY supp_nation, cust_nation, l_year""".stripMargin

  private val Q8 =
    """SELECT o_year,
      |  round(CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume_cents ELSE 0 END) AS BIGINT)
      |        / CAST(sum(volume_cents) AS BIGINT), 6) AS mkt_share
      |FROM (SELECT year(o_orderdate) AS o_year,
      |        CAST(round(l_extendedprice * (1.0 - l_discount) * 10000) AS BIGINT) AS volume_cents,
      |        n2.n_name AS nation
      |      FROM part JOIN lineitem ON p_partkey = l_partkey
      |      JOIN supplier ON s_suppkey = l_suppkey
      |      JOIN orders ON l_orderkey = o_orderkey
      |      JOIN customer ON o_custkey = c_custkey
      |      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |      JOIN region ON n1.n_regionkey = r_regionkey
      |      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |      WHERE r_name = 'EUROPE'
      |        AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate <= TIMESTAMP '1997-12-31'
      |        AND p_type = 'PROMO') all_nations
      |GROUP BY o_year""".stripMargin

  private val Q9 =
    """SELECT nation, o_year, CAST(sum(amount_cents) AS BIGINT) / 1e4 AS sum_profit
      |FROM (SELECT n_name AS nation, year(o_orderdate) AS o_year,
      |        CAST(round(l_extendedprice * (1.0 - l_discount) * 10000) AS BIGINT) AS amount_cents
      |      FROM part JOIN lineitem ON p_partkey = l_partkey
      |      JOIN supplier ON s_suppkey = l_suppkey
      |      JOIN orders ON o_orderkey = l_orderkey
      |      JOIN nation ON s_nationkey = n_nationkey
      |      WHERE p_name LIKE '%red%') profit
      |GROUP BY nation, o_year""".stripMargin

  private val Q10 =
    """SELECT c_custkey, c_name, round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
      |  c_acctbal, n_name
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
      |  AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, c_acctbal, n_name""".stripMargin

  private val Q13 =
    """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
      |FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      |      FROM customer LEFT OUTER JOIN orders
      |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |      GROUP BY c_custkey) c_orders
      |GROUP BY c_count""".stripMargin

  private val Q11 =
    """SELECT l_partkey, CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 1e2 AS part_value
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_name = 'NATION_3'
      |GROUP BY l_partkey
      |HAVING CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) >
      |  (SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) * 2e-3
      |   FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |   JOIN nation ON s_nationkey = n_nationkey
      |   WHERE n_name = 'NATION_3')""".stripMargin

  private val Q12 =
    """SELECT l_linestatus,
      |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT' AND o_orderpriority <> '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate > o_orderdate + INTERVAL '90' DAY
      |  AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |GROUP BY l_linestatus""".stripMargin

  private val Q14 =
    """SELECT round(1e2 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev_cents ELSE 0 END) AS BIGINT)
      |       / CAST(sum(rev_cents) AS BIGINT), 6) AS promo_revenue
      |FROM (SELECT p_type, CAST(round(l_extendedprice * (1.0 - l_discount) * 10000) AS BIGINT) AS rev_cents
      |      FROM lineitem JOIN part ON l_partkey = p_partkey
      |      WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01') t""".stripMargin

  private val Q15 =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |    CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS total_cents
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_cents / 1e4 AS total_revenue
      |FROM supplier JOIN revenue ON s_suppkey = supplier_no
      |WHERE total_cents = (SELECT max(total_cents) FROM revenue)""".stripMargin

  private val Q16 =
    """SELECT p_brand, p_type, p_size, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
      |JOIN part ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type, p_size""".stripMargin

  private val Q17 =
    """SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 1e2 / 7e0 AS avg_yearly
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#13'
      |  AND l_quantity < (SELECT 2e-1 * avg(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin

  private val Q18 =
    """SELECT c_name, c_custkey, o_orderkey, o_totalprice,
      |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
      |                     GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
      |GROUP BY c_name, c_custkey, o_orderkey, o_totalprice""".stripMargin

  private val Q19 =
    """SELECT round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#20' AND p_size BETWEEN 10 AND 25 AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 20 AND 35 AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  private val Q20 =
    """SELECT s_name, s_acctbal
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_name = 'NATION_3'
      |  AND s_suppkey IN (
      |    SELECT l_suppkey FROM lineitem
      |    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      |      AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |    GROUP BY l_suppkey HAVING sum(l_quantity) > 50)""".stripMargin

  private val Q21 =
    """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
      |FROM supplier
      |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE o_orderstatus = 'F' AND n_name = 'NATION_3'
      |  AND l1.l_shipdate > o_orderdate + INTERVAL '60' DAY
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3 JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
      |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL '60' DAY)
      |GROUP BY s_name""".stripMargin

  private val Q22 =
    """SELECT cntrycode, CAST(count(*) AS BIGINT) AS numcust,
      |  CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) / 1e2 AS totacctbal
      |FROM (SELECT CAST(c_nationkey % 5 AS BIGINT) AS cntrycode, c_acctbal, c_custkey
      |      FROM customer
      |      WHERE c_nationkey % 5 IN (0, 1, 2, 3)
      |        AND c_acctbal > (SELECT CAST(sum(CAST(round(c2.c_acctbal * 100) AS BIGINT)) AS BIGINT) / 1e2 / count(*)
      |                         FROM customer c2 WHERE c2.c_acctbal > 0e0 AND c2.c_nationkey % 5 IN (0, 1, 2, 3))) custsale
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '1999-01-01')
      |GROUP BY cntrycode""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // Q1: the wide full-table aggregation — one scan, map-side partial
    // aggregation into 6 groups, no join. The scan reads 7 of 11 columns
    // (column pruning) and pushes the shipdate filter to parquet.
    QueryDef(
      "q_sql_q1",
      (s, dir) => { views(s, dir, "lineitem"); s.sql(Q1) },
      Some(Q1),
      covers = Seq("ext-sql-surface", "ext-tpch-q1")),

    // Q4: EXISTS over the fact table — Catalyst decorrelates to a
    // LEFT SEMI join on l_orderkey; the correlated o_orderdate reaches
    // the join condition, not a per-row subquery.
    QueryDef(
      "q_sql_q4",
      (s, dir) => { views(s, dir, "orders", "lineitem"); s.sql(Q4) },
      Some(Q4),
      covers = Seq("ext-sql-surface", "ext-tpch-q4")),

    // Q7: nation joined TWICE under an OR of symmetric pairs — the
    // optimizer must keep both broadcast dims distinct and push the
    // pair-filter below the join of the two fact tables.
    QueryDef(
      "q_sql_q7",
      (s, dir) => {
        views(s, dir, "supplier", "lineitem", "orders", "customer", "nation")
        s.sql(Q7)
      },
      Some(Q7),
      covers = Seq("ext-sql-surface", "ext-tpch-q7")),

    // Q10: revenue per returned-item customer — 3 fact/dim joins where
    // orders' date filter must prune BEFORE the lineitem join.
    QueryDef(
      "q_sql_q10",
      (s, dir) => {
        views(s, dir, "customer", "orders", "lineitem", "nation")
        s.sql(Q10)
      },
      Some(Q10),
      covers = Seq("ext-sql-surface", "ext-tpch-q10")),

    // Q13: LEFT OUTER with a join-condition filter (NOT a WHERE — nulls
    // for customers whose only orders are urgent must survive), then a
    // distribution over the grouped counts.
    QueryDef(
      "q_sql_q13",
      (s, dir) => { views(s, dir, "customer", "orders"); s.sql(Q13) },
      Some(Q13),
      covers = Seq("ext-sql-surface", "ext-tpch-q13")),

    // Q18: IN-subquery with HAVING over the same fact table the outer
    // query joins — plans as one aggregate feeding a semi-join, the
    // fact table scanned twice but shuffled on the same key both times.
    QueryDef(
      "q_sql_q18",
      (s, dir) => {
        views(s, dir, "customer", "orders", "lineitem")
        s.sql(Q18)
      },
      Some(Q18),
      covers = Seq("ext-sql-surface", "ext-tpch-q18")),

    // Q19: the disjunctive-predicate stress — all three OR arms share
    // the p_partkey = l_partkey equi-join, so the planner must extract
    // the common join key instead of falling back to a nested loop, and
    // the per-arm brand/size/quantity ranges push into both scans as
    // an OR-of-ANDs filter.
    QueryDef(
      "q_sql_q19",
      (s, dir) => { views(s, dir, "lineitem", "part"); s.sql(Q19) },
      Some(Q19),
      covers = Seq("ext-sql-surface", "ext-tpch-q19")),

    // Q2: the correlated-scalar-subquery stress — min acctbal among THIS
    // part's regional suppliers. Catalyst decorrelates to an aggregate on
    // l_partkey joined back on equality; the part-supplier relation is
    // derived (DISTINCT l_partkey,l_suppkey) since the fixture has no
    // partsupp table — same derivation on both engines.
    QueryDef(
      "q_sql_q2",
      (s, dir) => {
        views(s, dir, "part", "lineitem", "supplier", "nation", "region")
        s.sql(Q2)
      },
      Some(Q2),
      covers = Seq("ext-sql-surface", "ext-tpch-q2")),

    // Q6: pure scan-filter-aggregate, no join — the predicate (date range
    // + discount band + quantity cap) must fully push to the parquet scan;
    // the money sum goes through the cents-integer contract (file header).
    QueryDef(
      "q_sql_q6",
      (s, dir) => { views(s, dir, "lineitem"); s.sql(Q6) },
      Some(Q6),
      covers = Seq("ext-sql-surface", "ext-tpch-q6")),

    // Q8: market share — a ratio of conditional sums per year over a
    // 7-table join. Both sums ride the same exact cents column, so the
    // share is ONE double division of two exact BIGINTs per group.
    QueryDef(
      "q_sql_q8",
      (s, dir) => {
        views(s, dir, "part", "lineitem", "supplier", "orders", "customer", "nation", "region")
        s.sql(Q8)
      },
      Some(Q8),
      covers = Seq("ext-sql-surface", "ext-tpch-q8")),

    // Q9: profit by supplier nation and year under a part-name LIKE — the
    // '%red%' filter prunes part BEFORE the fact join (suffix wildcard
    // can't push to parquet, but the dim is broadcast and tiny).
    QueryDef(
      "q_sql_q9",
      (s, dir) => {
        views(s, dir, "part", "lineitem", "supplier", "orders", "nation")
        s.sql(Q9)
      },
      Some(Q9),
      covers = Seq("ext-sql-surface", "ext-tpch-q9")),

    // Q11: HAVING against an uncorrelated scalar subquery that re-runs the
    // SAME aggregation — plans as two aggregates over one shuffled scan
    // shape, the threshold broadcast as a literal-at-runtime. Comparison is
    // exact-BIGINT vs (exact-BIGINT × one double product): deterministic.
    QueryDef(
      "q_sql_q11",
      (s, dir) => {
        views(s, dir, "lineitem", "supplier", "nation")
        s.sql(Q11)
      },
      Some(Q11),
      covers = Seq("ext-sql-surface", "ext-tpch-q11")),

    // Q12: lateness distribution (shipped >90 days after order — the
    // fixture's commitdate/receiptdate adaptation, Q4 precedent) with
    // CASE-sum pivoting on order priority.
    QueryDef(
      "q_sql_q12",
      (s, dir) => { views(s, dir, "orders", "lineitem"); s.sql(Q12) },
      Some(Q12),
      covers = Seq("ext-sql-surface", "ext-tpch-q12")),

    // Q14: promo share of one month's revenue — conditional/total ratio of
    // the same exact cents column (Q8 discipline), scaled by 1e2 (a DOUBLE
    // literal in both engines; 100.0 would be DECIMAL in DuckDB).
    QueryDef(
      "q_sql_q14",
      (s, dir) => { views(s, dir, "lineitem", "part"); s.sql(Q14) },
      Some(Q14),
      covers = Seq("ext-sql-surface", "ext-tpch-q14")),

    // Q15: the top-supplier view — one CTE referenced twice (grouped
    // revenue, then its max as a scalar subquery); the winner is selected
    // by EXACT BIGINT-cents equality, so cross-engine float ties can't
    // split the answer.
    QueryDef(
      "q_sql_q15",
      (s, dir) => { views(s, dir, "supplier", "lineitem"); s.sql(Q15) },
      Some(Q15),
      covers = Seq("ext-sql-surface", "ext-tpch-q15")),

    // Q16: supplier-count distribution over part attributes, with a NOT IN
    // subquery (null-aware anti-join on a never-null key) and a
    // count(DISTINCT) per group; part-supplier pairs derived as in Q2.
    QueryDef(
      "q_sql_q16",
      (s, dir) => {
        views(s, dir, "lineitem", "part", "supplier")
        s.sql(Q16)
      },
      Some(Q16),
      covers = Seq("ext-sql-surface", "ext-tpch-q16")),

    // Q17: small-quantity revenue — the correlated AVG subquery per part;
    // avg of integral doubles is exact-sum ÷ count (one correctly-rounded
    // division), so the 0.2×avg threshold is bit-identical cross-engine.
    QueryDef(
      "q_sql_q17",
      (s, dir) => { views(s, dir, "lineitem", "part"); s.sql(Q17) },
      Some(Q17),
      covers = Seq("ext-sql-surface", "ext-tpch-q17")),

    // Q20: nested IN-subqueries three deep (suppliers ← grouped-HAVING
    // lineitem ← part name filter) — plans as a chain of semi-joins, never
    // materializing the intermediate id lists on the driver.
    QueryDef(
      "q_sql_q20",
      (s, dir) => {
        views(s, dir, "supplier", "nation", "lineitem", "part")
        s.sql(Q20)
      },
      Some(Q20),
      covers = Seq("ext-sql-surface", "ext-tpch-q20")),

    // Q21: the waiting-supplier double-correlation — EXISTS (another
    // supplier in the order) AND NOT EXISTS (another LATE supplier). The
    // inner lateness re-joins orders on the subquery's own key so the only
    // correlated predicate is the l_orderkey equality — clean decorrelation
    // to one semi- and one anti-join on both engines.
    QueryDef(
      "q_sql_q21",
      (s, dir) => {
        views(s, dir, "supplier", "lineitem", "orders", "nation")
        s.sql(Q21)
      },
      Some(Q21),
      covers = Seq("ext-sql-surface", "ext-tpch-q21")),

    // Q22: dormant high-balance customers — an uncorrelated AVG threshold
    // (cents-exact) plus a dated NOT EXISTS anti-join against orders
    // (the fixture's every-customer-orders density makes the undated
    // original empty); cntrycode adapts c_phone substring to nationkey%5.
    QueryDef(
      "q_sql_q22",
      (s, dir) => { views(s, dir, "customer", "orders"); s.sql(Q22) },
      Some(Q22),
      covers = Seq("ext-sql-surface", "ext-tpch-q22"))
  )
}
