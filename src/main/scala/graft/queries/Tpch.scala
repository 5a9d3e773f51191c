package graft.queries

import graft.QueryDef
import graft.QueryDef.t

/** The TPC-H-shaped SQL surface, widened: beyond Q3/Q5 (Relational2),
  * the shape-diverse remainder expressible over the fixture's trimmed
  * columns — full-table wide aggregation (Q1), EXISTS decorrelation
  * (Q4), the double-nation self-join (Q7), group-per-entity revenue
  * (Q10), a grouped LEFT JOIN distribution (Q13), an IN-subquery with
  * HAVING (Q18), and disjunctive multi-column pushdown (Q19). Every
  * query is ONE spark.sql() string over registered temp views, and the
  * SAME text (modulo nothing — these avoid dialect-divergent functions)
  * runs on the DuckDB oracle, so Catalyst's plan is checked end to end
  * against an independent engine.
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
  * Adaptations (fixture lacks l_commitdate/l_receiptdate/l_shipmode/
  * p_container): Q4's lateness predicate is shipped-60-days-after-order;
  * Q19's disjunction ranges over p_brand/p_size/l_quantity only. Shape
  * and plan stress (decorrelation; disjunctive pushdown) are preserved.
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

  private val Q4 =
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL '60' DAY)
      |GROUP BY o_orderpriority""".stripMargin

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
      covers = Seq("ext-sql-surface", "ext-tpch-q19"))
  )
}
