package graft.queries

import graft.QueryDef
import graft.QueryDef.t
import graft.engine.Session
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Extended relational coverage beyond the reference's literal operator
  * set: semi/anti joins, distinct aggregation, rollup, top-k per group,
  * as-of join, running-window frames, set operations. The reference never
  * needs these (SURVEY.md §2.3/§2.7 note their absence) but a drop-in
  * analytics engine does; each is declared Spark-first and oracle-checked.
  */
object Relational2 {

  val defs: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    // Semi/anti joins: existence tests WITHOUT join fan-out — at scale the
    // build side ships only the key column and dedups during the join,
    // never multiplying rows like an inner join + distinct would.
    QueryDef(
      "q_semi_anti",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders").select("o_custkey")
        val semi = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
          .select(col("c_custkey")).withColumn("has_orders", lit(1))
        val anti = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey")).withColumn("has_orders", lit(0))
        semi.unionByName(anti)
      },
      Some("""SELECT c_custkey, CAST(1 AS INT) AS has_orders FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |UNION ALL
             |SELECT c_custkey, CAST(0 AS INT) AS has_orders FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin),
      covers = Seq("ext-semi-anti")),

    // ------------------------------------------------------------------
    // Distinct aggregation: count(DISTINCT) plans as a two-phase expand +
    // partial agg in Spark — the exact form; the approximate HLL variant
    // (approx_count_distinct) is asserted within 5% in Relational2Spec.
    QueryDef(
      "q_count_distinct",
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy("o_orderpriority")
          .agg(
            countDistinct("o_custkey").as("n_cust"),
            count(lit(1)).as("n_orders")),
      Some("""SELECT o_orderpriority,
             |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust,
             |  CAST(count(*) AS BIGINT) AS n_orders
             |FROM orders GROUP BY 1""".stripMargin),
      covers = Seq("ext-count-distinct")),

    // ------------------------------------------------------------------
    // Rollup: subtotal + grand-total rows in ONE pass (Expand operator),
    // vs N separate aggregations. grouping() flags disambiguate subtotal
    // NULLs from data NULLs.
    QueryDef(
      "q_rollup",
      (s, dir) =>
        t(s, dir, "orders")
          .rollup("o_orderstatus", "o_orderpriority")
          .agg(
            count(lit(1)).as("n"),
            round(sum("o_totalprice"), 2).as("revenue"),
            grouping("o_orderstatus").cast("int").as("g_status"),
            grouping("o_orderpriority").cast("int").as("g_prio")),
      Some("""SELECT o_orderstatus, o_orderpriority,
             |  CAST(count(*) AS BIGINT) AS n,
             |  round(sum(o_totalprice), 2) AS revenue,
             |  CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
             |  CAST(GROUPING(o_orderpriority) AS INT) AS g_prio
             |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin),
      covers = Seq("ext-rollup")),

    // ------------------------------------------------------------------
    // Top-k per group: rank window + filter. The filter on row_number
    // means each partition only RETAINS k rows after the sort — the
    // standard scale pattern (never a global sort + driver-side head).
    QueryDef(
      "q_topk_per_group",
      (s, dir) => {
        val w = Window.partitionBy("o_orderpriority")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, dir, "orders")
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select("o_orderpriority", "rk", "o_orderkey", "o_totalprice")
      },
      Some("""SELECT o_orderpriority, CAST(rk AS INT) AS rk, o_orderkey, o_totalprice
             |FROM (SELECT *, row_number() OVER
             |        (PARTITION BY o_orderpriority
             |         ORDER BY o_totalprice DESC, o_orderkey) rk
             |      FROM orders) WHERE rk <= 3""".stripMargin),
      covers = Seq("ext-topk")),

    // ------------------------------------------------------------------
    // As-of join: each event matched to the user's latest order at or
    // before the event time. Spark lacks a native as-of; the scale-safe
    // plan is NOT an equi-join with the range predicate as a join filter
    // (that materializes events×orders per user — quadratic on a hot key)
    // but a merge of the two timelines: union events+orders tagged, ONE
    // window sorted by (user, time) carrying the latest order forward
    // with last(ignoreNulls). Single shuffle on user_id, intermediate
    // linear in |events|+|orders|. Orders sort before events at the same
    // instant (kind 0 < 1) so the `<=` bound is inclusive; among same-
    // instant orders the ascending o_orderkey order makes the carried
    // value the max orderkey — the argmax tie-break both engines use.
    QueryDef(
      "q_asof_join",
      (s, dir) => {
        val ev = Session.events(s, dir)
          .select(
            col("user_id"),
            col("ts").as("t"),
            lit(1).as("kind"),
            col("event_id"),
            lit(null).cast("long").as("o_orderkey"))
        val o = t(s, dir, "orders")
          .select(
            col("o_custkey").as("user_id"),
            col("o_orderdate").as("t"),
            lit(0).as("kind"),
            lit(null).cast("long").as("event_id"),
            col("o_orderkey"))
        val w = Window.partitionBy("user_id")
          .orderBy(col("t"), col("kind"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        o.unionByName(ev)
          .withColumn("last_order", last("o_orderkey", ignoreNulls = true).over(w))
          .filter(col("kind") === 1 && col("last_order").isNotNull)
          .select("event_id", "user_id", "last_order")
      },
      Some("""SELECT event_id, user_id, o_orderkey AS last_order
             |FROM (SELECT e.event_id, e.user_id, o.o_orderkey,
             |        row_number() OVER (PARTITION BY e.event_id
             |          ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) rn
             |      FROM events e
             |      JOIN orders o ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts)
             |WHERE rn = 1""".stripMargin),
      covers = Seq("ext-asof")),

    // ------------------------------------------------------------------
    // NEAREST as-of join — both directions, minimum |Δt| wins, backward
    // on ties: the telemetry-alignment shape ("closest reading to each
    // event") the one-sided as-of can't express. Same timeline-merge
    // plan, ONE shuffle on user_id: a backward carry (last order ≤ t)
    // and a forward carry (first order > t, same-instant orders belong
    // to the backward side by the kind sort) over the merged stream,
    // then row-level distance arithmetic picks the side. The oracle is
    // the pair-exploding quadratic formulation with the identical
    // (distance, backward-first, per-side key) tie ladder — viable only
    // at oracle scale, which is the point of the merge plan.
    QueryDef(
      "q_asof_nearest",
      (s, dir) => {
        val ev = Session.events(s, dir)
          .select(
            col("user_id"),
            col("ts").as("t"),
            lit(1).as("kind"),
            col("event_id"),
            lit(null).cast("long").as("o_orderkey"))
        val o = t(s, dir, "orders")
          .select(
            col("o_custkey").as("user_id"),
            col("o_orderdate").cast("timestamp").as("t"),
            lit(0).as("kind"),
            lit(null).cast("long").as("event_id"),
            col("o_orderkey"))
        val ord = when(col("kind") === 0, struct(col("t").as("ot"), col("o_orderkey").as("ok")))
        val back = Window.partitionBy("user_id")
          .orderBy(col("t"), col("kind"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val fwd = Window.partitionBy("user_id")
          .orderBy(col("t"), col("kind"), col("o_orderkey"))
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        o.unionByName(ev)
          .withColumn("prev", last(ord, ignoreNulls = true).over(back))
          .withColumn("next", first(ord, ignoreNulls = true).over(fwd))
          .filter(col("kind") === 1)
          .withColumn("prev_d", unix_timestamp(col("t")) - unix_timestamp(col("prev.ot")))
          .withColumn("next_d", unix_timestamp(col("next.ot")) - unix_timestamp(col("t")))
          .withColumn(
            "pick_prev",
            col("next").isNull || (col("prev").isNotNull && col("prev_d") <= col("next_d")))
          .filter(col("prev").isNotNull || col("next").isNotNull)
          .select(
            col("event_id"),
            col("user_id"),
            when(col("pick_prev"), col("prev.ok")).otherwise(col("next.ok"))
              .as("nearest_order"),
            when(col("pick_prev"), col("prev_d")).otherwise(col("next_d"))
              .as("dist_s"))
      },
      // dist floors the event timestamp to whole seconds FIRST (Spark's
      // unix_timestamp semantics) — epoch() in the oracle dialect keeps
      // fractional seconds, and a bare CAST would round them.
      Some("""SELECT event_id, user_id, o_orderkey AS nearest_order, dist_s
             |FROM (
             |  SELECT e.event_id, e.user_id, o.o_orderkey,
             |    abs(CAST(floor(epoch(e.ts)) AS BIGINT)
             |      - CAST(epoch(CAST(o.o_orderdate AS TIMESTAMP)) AS BIGINT)) AS dist_s,
             |    row_number() OVER (PARTITION BY e.event_id
             |      ORDER BY
             |        abs(CAST(floor(epoch(e.ts)) AS BIGINT)
             |          - CAST(epoch(CAST(o.o_orderdate AS TIMESTAMP)) AS BIGINT)),
             |        CASE WHEN CAST(o.o_orderdate AS TIMESTAMP) <= e.ts THEN 0 ELSE 1 END,
             |        CASE WHEN CAST(o.o_orderdate AS TIMESTAMP) <= e.ts
             |          THEN -o.o_orderkey ELSE o.o_orderkey END) AS rn
             |  FROM events e JOIN orders o ON e.user_id = o.o_custkey)
             |WHERE rn = 1""".stripMargin),
      covers = Seq("ext-asof-nearest")),

    // ------------------------------------------------------------------
    // Running aggregate with an explicit ROWS frame: prefix sums in one
    // pass per partition. Rounded at the values' own decimal count —
    // engines differ in sliding-sum accumulation strategy at the ulp.
    QueryDef(
      "q_window_running",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "orders")
          .select(
            col("o_custkey"),
            col("o_orderkey"),
            round(sum("o_totalprice").over(w), 2).as("running_rev"))
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
             |    ORDER BY o_orderdate, o_orderkey
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_rev
             |FROM orders""".stripMargin),
      covers = Seq("ext-window-frame")),

    // ------------------------------------------------------------------
    // The SQL surface: every table registered as a temp view, the query
    // submitted as one spark.sql() string (TPC-H Q3 shape) — same text
    // modulo dialect runs on the DuckDB oracle. Catalyst treats it
    // identically to the DataFrame plans above.
    QueryDef(
      "q_sql_revenue",
      (s, dir) => {
        for (n <- Seq("customer", "orders", "lineitem"))
          t(s, dir, n).createOrReplaceTempView(n)
        s.sql("""SELECT l_orderkey,
                |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
                |  date_format(o_orderdate, 'yyyy-MM-dd') AS order_date,
                |  o_orderpriority
                |FROM customer JOIN orders ON c_custkey = o_custkey
                |JOIN lineitem ON l_orderkey = o_orderkey
                |WHERE c_mktsegment = 'BUILDING'
                |  AND o_orderdate < TIMESTAMP '1995-03-15'
                |  AND l_shipdate > TIMESTAMP '1995-03-15'
                |GROUP BY l_orderkey, o_orderdate, o_orderpriority""".stripMargin)
      },
      Some("""SELECT l_orderkey,
             |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
             |  strftime(o_orderdate, '%Y-%m-%d') AS order_date,
             |  o_orderpriority
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderdate < TIMESTAMP '1995-03-15'
             |  AND l_shipdate > TIMESTAMP '1995-03-15'
             |GROUP BY l_orderkey, o_orderdate, o_orderpriority""".stripMargin),
      covers = Seq("ext-sql-surface")),

    // ------------------------------------------------------------------
    // TPC-H Q5 shape — the join-ORDER showcase: 6 tables where everything
    // hinges on the optimizer collapsing region→nation→supplier into a
    // broadcast chain and joining the fact tables once. The supplier join
    // carries the c_nationkey = s_nationkey correlation (local supplier),
    // which prunes most pairs AT the join instead of after it. Same text
    // both engines; revenue is a sum of exact-at-4-decimals money products
    // (q_sql_revenue precedent).
    QueryDef(
      "q_sql_q5",
      (s, dir) => {
        for (n <- Seq("region", "nation", "supplier", "customer", "orders", "lineitem"))
          t(s, dir, n).createOrReplaceTempView(n)
        s.sql("""SELECT n_name,
                |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
                |FROM customer
                |JOIN orders ON c_custkey = o_custkey
                |JOIN lineitem ON l_orderkey = o_orderkey
                |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
                |JOIN nation ON s_nationkey = n_nationkey
                |JOIN region ON n_regionkey = r_regionkey
                |WHERE r_name = 'ASIA'
                |  AND o_orderdate >= TIMESTAMP '1996-01-01'
                |  AND o_orderdate < TIMESTAMP '1997-01-01'
                |GROUP BY n_name""".stripMargin)
      },
      Some("""SELECT n_name,
             |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |  AND o_orderdate >= TIMESTAMP '1996-01-01'
             |  AND o_orderdate < TIMESTAMP '1997-01-01'
             |GROUP BY n_name""".stripMargin),
      covers = Seq("ext-sql-q5")),

    // ------------------------------------------------------------------
    // Set operations: INTERSECT / EXCEPT with SQL bag-to-set semantics.
    QueryDef(
      "q_set_ops",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val bld = c.filter(col("c_mktsegment") === "BUILDING").select("c_nationkey")
        val auto = c.filter(col("c_mktsegment") === "AUTOMOBILE").select("c_nationkey")
        bld.intersect(auto).withColumn("which", lit("both"))
          .unionByName(bld.except(auto).withColumn("which", lit("building_only")))
      },
      Some("""SELECT c_nationkey, 'both' AS which FROM (
             |  SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
             |  INTERSECT
             |  SELECT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
             |UNION ALL
             |SELECT c_nationkey, 'building_only' AS which FROM (
             |  SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
             |  EXCEPT
             |  SELECT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')""".stripMargin),
      covers = Seq("ext-set-ops"))
  )
}
