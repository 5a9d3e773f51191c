package graft.queries

import graft.QueryDef
import graft.QueryDef.t
import graft.engine.Session
import org.apache.spark.sql.functions._

/** Fourth relational wave: full CUBE, batch sliding (overlapping) windows,
  * deterministic stratified sampling, and fixed-width histogram profiling —
  * the remaining aggregation/profiling shapes a training-data pipeline
  * leans on for corpus audits.
  */
object Relational4 {

  // Declared before `defs`: a val referenced from the Seq initializer must
  // already be initialized (forward reference would be null at object init).
  private val ScalarSubquerySql =
    """SELECT o_orderkey, o_totalprice,
      |  (SELECT max(l_extendedprice) FROM lineitem
      |   WHERE l_orderkey = o_orderkey) AS max_line_price
      |FROM orders""".stripMargin

  private val LateralTopkSql =
    """SELECT n_name, c.c_name, c.c_acctbal
      |FROM nation,
      |LATERAL (SELECT c_name, c_acctbal FROM customer
      |         WHERE c_nationkey = n_nationkey
      |         ORDER BY c_acctbal DESC, c_name LIMIT 2) c""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    // CUBE: all four grouping-set combinations of (status, priority) in one
    // Expand pass over the fact table — completes the rollup/grouping-sets
    // family (q_rollup, q_grouping_sets). grouping() flags disambiguate
    // genuine NULLs from subtotal rows.
    QueryDef(
      "q_cube",
      (s, dir) =>
        t(s, dir, "orders")
          .cube("o_orderstatus", "o_orderpriority")
          .agg(
            count(lit(1)).as("n"),
            round(sum("o_totalprice"), 2).as("revenue"),
            grouping("o_orderstatus").cast("int").as("g_status"),
            grouping("o_orderpriority").cast("int").as("g_prio")),
      Some("""SELECT o_orderstatus, o_orderpriority,
             |  CAST(count(*) AS BIGINT) AS n,
             |  round(sum(o_totalprice), 2) AS revenue,
             |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
             |  CAST(grouping(o_orderpriority) AS INT) AS g_prio
             |FROM orders
             |GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin),
      covers = Seq("ext-cube")),

    // ------------------------------------------------------------------
    // Sliding event-time windows in batch: size 2h, slide 1h — every event
    // lands in exactly two windows. Spark's window() plans this as one
    // Expand (2 rows per event) + hash agg, the same shape the streaming
    // engine uses; the oracle makes the two-window membership explicit with
    // a shifted-trunc UNION ALL.
    QueryDef(
      "q_sliding_window",
      (s, dir) =>
        Session.events(s, dir)
          .groupBy(
            window(col("ts"), "2 hours", "1 hour").as("w"),
            col("event_type"))
          .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
          .select(
            date_format(col("w.start"), "yyyy-MM-dd HH:mm").as("window_start"),
            col("event_type"),
            col("n"),
            col("total_value")),
      Some("""WITH ex AS (
             |  SELECT date_trunc('hour', ts) AS ws, event_type, value FROM events
             |  UNION ALL
             |  SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR AS ws, event_type, value
             |  FROM events)
             |SELECT strftime(ws, '%Y-%m-%d %H:%M') AS window_start, event_type,
             |  CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS total_value
             |FROM ex GROUP BY 1, 2""".stripMargin),
      covers = Seq("ext-sliding-window", "2.9")),

    // ------------------------------------------------------------------
    // Stratified sampling with per-stratum rates (the sampleBy shape), but
    // DETERMINISTIC: membership comes from a hash digit of the stable key,
    // not rand(), so the sample is identical across runs, engines and
    // cluster sizes — a reproducibility requirement for training corpora.
    // Rates: click 4/16, view 8/16, purchase 1/16, signup 12/16, error 0.
    // Pure row-level filter — no shuffle, pushdown-friendly.
    QueryDef(
      "q_stratified_sample",
      (s, dir) => {
        val d = substring(md5(col("event_id").cast("string")), 1, 1)
        Session.table(s, dir, "events")
          .filter(
            when(col("event_type") === "click", d < "4")
              .when(col("event_type") === "view", d < "8")
              .when(col("event_type") === "purchase", d < "1")
              .when(col("event_type") === "signup", d < "c")
              .otherwise(lit(false)))
          .select(col("event_id"), col("event_type"), col("user_id"))
      },
      Some("""SELECT event_id, event_type, user_id FROM events
             |WHERE CASE event_type
             |  WHEN 'click' THEN substr(md5(CAST(event_id AS VARCHAR)), 1, 1) < '4'
             |  WHEN 'view' THEN substr(md5(CAST(event_id AS VARCHAR)), 1, 1) < '8'
             |  WHEN 'purchase' THEN substr(md5(CAST(event_id AS VARCHAR)), 1, 1) < '1'
             |  WHEN 'signup' THEN substr(md5(CAST(event_id AS VARCHAR)), 1, 1) < 'c'
             |  ELSE FALSE END""".stripMargin),
      covers = Seq("ext-stratified-sample")),

    // ------------------------------------------------------------------
    // Fixed-width histogram (profiling primitive): clamp-binned totalprice,
    // 12 × 50k buckets. floor((x - lo)/w) is the identical IEEE op tree in
    // both engines; the agg shuffles 12 rows after map-side combine.
    QueryDef(
      "q_histogram",
      (s, dir) => {
        val width = 50000.0
        t(s, dir, "orders")
          .select(
            least(greatest(floor(col("o_totalprice") / lit(width)), lit(0L)), lit(11L))
              .cast("int").as("bucket"),
            col("o_totalprice"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("revenue"))
          .withColumn("bucket_lo", col("bucket") * lit(width))
      },
      Some("""SELECT bucket, CAST(count(*) AS BIGINT) AS n,
             |  round(sum(o_totalprice), 2) AS revenue,
             |  bucket * 50000.0 AS bucket_lo
             |FROM (SELECT CAST(least(greatest(floor(o_totalprice / 50000.0), 0), 11) AS INT)
             |        AS bucket, o_totalprice
             |      FROM orders)
             |GROUP BY bucket""".stripMargin),
      covers = Seq("ext-histogram")),

    // ------------------------------------------------------------------
    // Correlated scalar subquery — submitted as SQL; Catalyst DECORRELATES
    // it (RewriteCorrelatedScalarSubquery) into an aggregate + left join,
    // so execution is one keyed shuffle, never a per-row probe. The same
    // text runs verbatim on the oracle. max() of 2-decimal prices is exact:
    // no rounding.
    QueryDef(
      "q_scalar_subquery",
      (s, dir) => {
        t(s, dir, "orders").createOrReplaceTempView("orders")
        t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
        s.sql(ScalarSubquerySql)
      },
      Some(ScalarSubquerySql),
      covers = Seq("ext-scalar-subquery")),

    // ------------------------------------------------------------------
    // LATERAL join: per-nation top-2 customers by balance — the correlated
    // table subquery form of q_topk_per_group. Spark decorrelates the
    // correlated ORDER BY ... LIMIT into a ranked window join; same text on
    // the oracle.
    QueryDef(
      "q_lateral_topk",
      (s, dir) => {
        t(s, dir, "nation").createOrReplaceTempView("nation")
        t(s, dir, "customer").createOrReplaceTempView("customer")
        s.sql(LateralTopkSql)
      },
      Some(LateralTopkSql),
      covers = Seq("ext-lateral-join"))
  )
}
