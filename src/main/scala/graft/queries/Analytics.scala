package graft.queries

import graft.QueryDef
import graft.QueryDef.t
import graft.engine.Session
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral-analytics + data-quality wave: sketch-pruned heavy hitters,
  * statistical anomaly flagging, SCD-2 history construction, funnel and
  * cohort-retention analysis, bounded-edit-distance fuzzy matching, and a
  * BPE-style regex pre-tokenizer. None of these exist in the reference
  * (SURVEY.md §2.4/§2.6 note the absence of any analytics surface); they
  * are the operations a training-data/product pipeline runs daily, each
  * declared Spark-first and DuckDB-oracle-checked.
  *
  * Event timestamps: the driver's events.parquet carries TIMESTAMP(NANOS),
  * which Spark reads as epoch-nano longs (`nanosAsLong`) and DuckDB as a
  * micros-grain timestamp. Every cross-engine-compared time value is
  * therefore computed in integer MICROS via `ts div 1000` / `epoch_us(ts)`
  * (never FP division: epoch nanos overflow double precision).
  */
object Analytics {

  val defs: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    // Heavy hitters with count-min-sketch pruning. The 100 TB shape: ONE
    // pass folds the corpus into a fixed-size CMS (mergeable partial
    // sketches, no shuffle of raw keys); the key dictionary (here: the
    // distinct user ids — in production the users dimension) is probed
    // against the sketch on the driver, and only the candidate keys go
    // through the exact count. CMS never underestimates, so candidates ⊇
    // true heavy hitters and the exact HAVING filter restores exactness —
    // the oracle is the plain GROUP BY ... HAVING, blind to the sketch.
    QueryDef(
      "q_heavy_hitters",
      (s, dir) => {
        val ev = Session.table(s, dir, "events")
        val threshold = 75L
        val cms = ev.stat.countMinSketch(
          "user_id", eps = 0.001, confidence = 0.99, seed = 42)
        val candidates = ev.select("user_id").distinct().collect()
          .map(_.getLong(0))
          .filter(u => cms.estimateCount(u) >= threshold)
        ev.filter(col("user_id").isin(candidates.map(_.asInstanceOf[Any]): _*))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n"))
          .filter(col("n") >= threshold)
      },
      Some("""SELECT user_id, CAST(count(*) AS BIGINT) AS n
             |FROM events GROUP BY 1 HAVING count(*) >= 75""".stripMargin),
      covers = Seq("ext-heavy-hitters")),

    // ------------------------------------------------------------------
    // Z-score anomaly flagging: per-type mean/stddev, events beyond 3σ.
    // The stats are rounded to 6 decimals BEFORE the z computation so both
    // engines derive z from bit-identical inputs — the filter line is then
    // exact IEEE arithmetic, not a rounding race. Plan: one partial-agg
    // shuffle for the 5-row stats frame, broadcast back over the scan.
    QueryDef(
      "q_anomaly_zscore",
      (s, dir) => {
        val ev = Session.table(s, dir, "events")
        val stats = ev.groupBy("event_type").agg(
          round(avg("value"), 6).as("mu"),
          round(stddev_samp("value"), 6).as("sd"))
        ev.join(broadcast(stats), "event_type")
          .withColumn("z", (col("value") - col("mu")) / col("sd"))
          .filter(abs(col("z")) > 3.0)
          .select(
            col("event_id"),
            col("event_type"),
            col("value"),
            round(col("z"), 6).as("z"))
      },
      Some("""WITH s AS (SELECT event_type, round(avg(value), 6) AS mu,
             |                 round(stddev_samp(value), 6) AS sd
             |            FROM events GROUP BY 1)
             |SELECT event_id, e.event_type, value,
             |  round((value - mu) / sd, 6) AS z
             |FROM events e JOIN s USING (event_type)
             |WHERE abs((value - mu) / sd) > 3.0""".stripMargin),
      covers = Seq("ext-anomaly-zscore")),

    // ------------------------------------------------------------------
    // SCD-2 interval construction (the CDC/dimension-history op): each
    // event versions its user's state until the next event — valid_from =
    // its time, valid_to = lead() over the user's timeline, open interval
    // marked current. One window pass per user partition; at scale this is
    // a single shuffle on the natural key, no self-join.
    QueryDef(
      "q_scd2_intervals",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
        Session.table(s, dir, "events")
          .select(
            col("user_id"), col("event_id"), col("value"),
            expr("ts div 1000").as("valid_from"))
          .withColumn("valid_to", lead("valid_from", 1).over(w))
          .withColumn("is_current", col("valid_to").isNull.cast("int"))
      },
      Some("""SELECT user_id, event_id, value,
             |  epoch_us(ts) AS valid_from,
             |  lead(epoch_us(ts)) OVER w AS valid_to,
             |  CAST(lead(epoch_us(ts)) OVER w IS NULL AS INT) AS is_current
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)""".stripMargin),
      covers = Seq("ext-scd2")),

    // ------------------------------------------------------------------
    // Funnel stages: how deep does each user get through view → click →
    // purchase, by first-occurrence ordering (min timestamp per stage,
    // each stage strictly after the previous one). One conditional-min
    // aggregation per user — a single shuffle carrying 3 longs per user —
    // then a 4-row stage histogram. Comparisons stay in Spark's native
    // nano grain: only orderings cross engines, not the values.
    QueryDef(
      "q_funnel_stages",
      (s, dir) => {
        def minTs(tpe: String) =
          min(when(col("event_type") === tpe, col("ts")))
        Session.table(s, dir, "events")
          .groupBy("user_id")
          .agg(minTs("view").as("v"), minTs("click").as("c"), minTs("purchase").as("p"))
          .withColumn(
            "stage",
            when(col("v").isNotNull && col("c") > col("v") && col("p") > col("c"), 3)
              .when(col("v").isNotNull && col("c") > col("v"), 2)
              .when(col("v").isNotNull, 1)
              .otherwise(0))
          .groupBy("stage")
          .agg(count(lit(1)).as("users"))
      },
      Some("""WITH f AS (
             |  SELECT user_id,
             |    min(ts) FILTER (WHERE event_type = 'view') AS v,
             |    min(ts) FILTER (WHERE event_type = 'click') AS c,
             |    min(ts) FILTER (WHERE event_type = 'purchase') AS p
             |  FROM events GROUP BY 1)
             |SELECT CASE WHEN v IS NOT NULL AND c > v AND p > c THEN 3
             |            WHEN v IS NOT NULL AND c > v THEN 2
             |            WHEN v IS NOT NULL THEN 1 ELSE 0 END AS stage,
             |  CAST(count(*) AS BIGINT) AS users
             |FROM f GROUP BY 1""".stripMargin),
      covers = Seq("ext-funnel")),

    // ------------------------------------------------------------------
    // Cohort retention: users grouped by first-active day, activity
    // counted per day-offset from the cohort day. The min-over-user is a
    // window (one shuffle on user_id), the retention matrix a second
    // partial-agg shuffle — the canonical two-stage cohort plan; no
    // self-join of the events table against itself.
    QueryDef(
      "q_retention_cohort",
      (s, dir) => {
        val w = Window.partitionBy("user_id")
        Session.table(s, dir, "events")
          .select(col("user_id"), expr("(ts div 1000) div 86400000000").as("day"))
          .withColumn("cohort", min("day").over(w))
          .groupBy(col("cohort"), (col("day") - col("cohort")).as("day_offset"))
          .agg(countDistinct("user_id").as("users"))
      },
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
             |c AS (SELECT user_id, day,
             |        min(day) OVER (PARTITION BY user_id) AS cohort FROM e)
             |SELECT cohort, day - cohort AS day_offset,
             |  CAST(count(DISTINCT user_id) AS BIGINT) AS users
             |FROM c GROUP BY 1, 2""".stripMargin),
      covers = Seq("ext-retention")),

    // ------------------------------------------------------------------
    // Fuzzy match on bounded edit distance over the distinct-name
    // dictionary. The dictionary is tiny after distinct (names repeat
    // across the catalog), so the all-pairs comparison is a broadcast
    // nested loop over it — NOT over the base table. At dictionary scale
    // the prefix/length filtering of operators.SetSimJoin is the same
    // pruning story; this query is the operator surface.
    QueryDef(
      "q_fuzzy_join",
      (s, dir) => {
        val names = t(s, dir, "part").select("p_name").distinct()
        val a = names.select(col("p_name").as("name_a"))
        val b = names.select(col("p_name").as("name_b"))
        a.join(
            broadcast(b),
            col("name_a") < col("name_b") &&
              levenshtein(col("name_a"), col("name_b")) <= 2)
          .select(
            col("name_a"), col("name_b"),
            levenshtein(col("name_a"), col("name_b")).as("lev"))
      },
      Some("""WITH n AS (SELECT DISTINCT p_name FROM part)
             |SELECT a.p_name AS name_a, b.p_name AS name_b,
             |  CAST(levenshtein(a.p_name, b.p_name) AS INT) AS lev
             |FROM n a JOIN n b
             |  ON a.p_name < b.p_name AND levenshtein(a.p_name, b.p_name) <= 2""".stripMargin),
      covers = Seq("ext-fuzzy-join")),

    // ------------------------------------------------------------------
    // BPE-style regex pre-tokenization (the GPT-2 pre-tokenizer shape,
    // ASCII-reduced): runs of letters / digits / punctuation, each
    // optionally carrying its leading space — the split a byte-pair
    // tokenizer starts from. Top-30 corpus vocabulary with deterministic
    // tie-break. Pure scan + explode + partial-agg count: one shuffle of
    // (token, count) pairs, never the documents.
    QueryDef(
      "q_bpe_tokens",
      (s, dir) =>
        t(s, dir, "documents")
          .select(explode(
            expr("regexp_extract_all(text, ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+', 0)")).as("tok"))
          .groupBy("tok")
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("tok"))
          .limit(30),
      Some("""SELECT tok, CAST(count(*) AS BIGINT) AS n
             |FROM (SELECT unnest(regexp_extract_all(text, ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+')) AS tok
             |      FROM documents)
             |GROUP BY 1 ORDER BY n DESC, tok LIMIT 30""".stripMargin),
      covers = Seq("ext-bpe-pretokenize")),

    // ------------------------------------------------------------------
    // PageRank (operators.Graph): 3 synchronous power iterations over the
    // undirected customer↔supplier trade graph (supplier ids offset by 1M
    // to disjoint the key spaces). Each iteration is one join + one
    // aggregation with localCheckpoint'ed state — O(1) lineage per step.
    // The oracle replays the identical iterations as chained CTEs; the
    // per-iteration round(r, 12) in BOTH engines is what keeps three
    // rounds of FP-order-dependent sums bit-aligned.
    QueryDef(
      "q_pagerank",
      (s, dir) => {
        val co = t(s, dir, "orders")
          .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
          .select(
            col("o_custkey").as("src"),
            (col("l_suppkey") + lit(1000000L)).as("dst"))
          .distinct()
        val edges = co.union(co.select(col("dst").as("src"), col("src").as("dst")))
        graft.operators.Graph.pageRank(edges, iters = 3, damping = 0.85)
          .select(col("id"), round(col("r"), 8).as("r"))
      },
      Some {
        def iter(k: Int): String =
          s"""c$k AS (SELECT e.dst AS id, sum(p.r / dg.d) AS s
             |       FROM edges e JOIN r${k - 1} p ON p.id = e.src
             |       JOIN deg dg ON dg.src = e.src
             |       GROUP BY 1),
             |r$k AS (SELECT nd.id, round((1 - 0.85) / n + 0.85 * coalesce(c$k.s, 0), 12) AS r
             |       FROM nodes nd CROSS JOIN nn LEFT JOIN c$k ON c$k.id = nd.id)""".stripMargin
        s"""WITH co AS (
           |  SELECT DISTINCT o_custkey AS src, 1000000 + l_suppkey AS dst
           |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
           |edges AS (SELECT src, dst FROM co UNION ALL SELECT dst, src FROM co),
           |nodes AS (SELECT DISTINCT src AS id FROM edges),
           |deg AS (SELECT src, count(*) AS d FROM edges GROUP BY 1),
           |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
           |r0 AS (SELECT id, 1.0 / n AS r FROM nodes CROSS JOIN nn),
           |${iter(1)},
           |${iter(2)},
           |${iter(3)}
           |SELECT id, round(r, 8) AS r FROM r3""".stripMargin
      },
      covers = Seq("ext-pagerank"))
  )
}
