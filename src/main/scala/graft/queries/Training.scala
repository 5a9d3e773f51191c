package graft.queries

import graft.QueryDef
import graft.QueryDef.t
import org.apache.spark.sql.functions._

/** Training-data export operators: the last pipeline stages before tokens
  * hit a trainer — fixed-length sequence packing and PII redaction. Both
  * are absent from the reference (its surface stops at relational ETL);
  * they are first-class here because a 100 TB corpus engine that cannot
  * emit training shards or scrub contact strings is not complete.
  */
object Training {

  /** Same BPE-ish token pattern as q_text_stats — packing must count the
    * tokens the pipeline's own tokenizer counts.
    */
  private val TokenPat = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  private val SeqLen = 512L

  private val EmailPat = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val IpPat = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  private val MixTargetN = 200L

  val defs: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    // Concat-and-chunk sequence packing (operators.Pack): documents in
    // doc_id order become one token stream cut into 512-token chunks; a
    // doc spans every chunk its interval overlaps. The global running
    // offset is the GlobalRank-style two-phase prefix sum — range shuffle
    // + partition-local windows + broadcast offsets — never a
    // single-partition window. Oracle replays the same arithmetic with a
    // plain window cumsum (fine at sf, the exact thing that cannot run at
    // 100 TB — which is the point of the operator).
    QueryDef(
      "q_pack_sequences",
      (s, dir) => {
        val toks = t(s, dir, "documents")
          .select(
            col("doc_id"),
            size(regexp_extract_all(lower(col("text")), lit(TokenPat), lit(0)))
              .cast("long").as("tok"))
        graft.operators.Pack
          .packChunks(toks, "doc_id", "tok", SeqLen, col("doc_id"))
      },
      Some(s"""WITH toks AS (
              |  SELECT doc_id,
              |    CAST(length(regexp_extract_all(lower(text), '$TokenPat')) AS BIGINT) AS tok
              |  FROM documents),
              |pre AS (
              |  SELECT doc_id, tok,
              |    CAST(COALESCE(sum(tok) OVER (ORDER BY doc_id
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS s0
              |  FROM toks WHERE tok > 0),
              |spans AS (
              |  SELECT doc_id, tok, s0, s0 + tok AS e0,
              |    unnest(generate_series(s0 // $SeqLen, (s0 + tok - 1) // $SeqLen)) AS chunk_id
              |  FROM pre)
              |SELECT doc_id, chunk_id,
              |  least(e0, (chunk_id + 1) * $SeqLen) - greatest(s0, chunk_id * $SeqLen)
              |    AS tok_in_chunk
              |FROM spans""".stripMargin),
      covers = Seq("ext-pack-sequences")),

    // ------------------------------------------------------------------
    // Per-LANGUAGE sequence packing: chunk ids restart per language, so
    // training shards come out language-pure (mixing ratios then set by
    // sampling shards, not re-tokenizing). Offsets come from the
    // grouped two-phase prefix sum — range-partitioned on (lang, doc),
    // so one hot language still spans many parallel tasks where a naive
    // PARTITION BY lang window funnels it through one.
    QueryDef(
      "q_pack_by_lang",
      (s, dir) => {
        val toks = t(s, dir, "documents")
          .select(
            col("lang"),
            col("doc_id"),
            size(regexp_extract_all(lower(col("text")), lit(TokenPat), lit(0)))
              .cast("long").as("tok"))
        graft.operators.Pack
          .packChunksByGroup(toks, "lang", "doc_id", "tok", SeqLen, col("doc_id"))
      },
      Some(s"""WITH toks AS (
              |  SELECT lang, doc_id,
              |    CAST(length(regexp_extract_all(lower(text), '$TokenPat')) AS BIGINT) AS tok
              |  FROM documents),
              |pre AS (
              |  SELECT lang, doc_id, tok,
              |    CAST(COALESCE(sum(tok) OVER (PARTITION BY lang ORDER BY doc_id
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS s0
              |  FROM toks WHERE tok > 0),
              |spans AS (
              |  SELECT lang, doc_id, tok, s0, s0 + tok AS e0,
              |    unnest(generate_series(s0 // $SeqLen, (s0 + tok - 1) // $SeqLen)) AS chunk_id
              |  FROM pre)
              |SELECT lang, doc_id, chunk_id,
              |  least(e0, (chunk_id + 1) * $SeqLen) - greatest(s0, chunk_id * $SeqLen)
              |    AS tok_in_chunk
              |FROM spans""".stripMargin),
      covers = Seq("ext-pack-by-group")),

    // ------------------------------------------------------------------
    // END-TO-END training-data export — the full curation pipeline in
    // ONE query, every stage the 100 TB formulation: exact dedup (keep
    // min doc_id per normalized fingerprint — one window on fp) →
    // quality gate (the q_corpus_clean scoring) → per-source cap (50 by
    // md5 priority, the data-mixing primitive) → token counting (the
    // pipeline's own tokenizer) → GPT-style 512-token sequence packing
    // over the SURVIVING docs (two-phase global prefix sum, never a
    // single-partition window). This is the "prepare a training shard"
    // flagship: a user runs exactly this composition daily.
    QueryDef(
      "q_training_export",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val base = t(s, dir, "documents")
          .select(
            col("doc_id"),
            col("source"),
            md5(trim(regexp_replace(lower(col("text")), "\\s+", " ")).cast("binary"))
              .as("fp"),
            length(col("text")).as("len"),
            size(Text.words(col("text"))).as("n_words"),
            (length(col("text")) -
              length(regexp_replace(col("text"), "[^a-zA-Z0-9\\s]", "")))
              .as("punct_cnt"),
            Text.hitCount(Text.words(col("text")), Text.StopEn).as("stop_cnt"),
            size(regexp_extract_all(lower(col("text")), lit(TokenPat), lit(0)))
              .cast("long").as("tok"))
          .withColumn(
            "quality",
            least(lit(1.0), col("n_words") / lit(100.0)) * 0.5 +
              (lit(1.0) - least(lit(1.0), col("punct_cnt") * lit(10.0) / col("len"))) * 0.3 +
              least(lit(1.0), col("stop_cnt") * lit(5.0) / col("n_words")) * 0.2)
        val curated = base
          .withColumn("keep", min("doc_id").over(Window.partitionBy("fp")))
          .filter(col("doc_id") === col("keep") && col("quality") >= 0.5)
          .withColumn(
            "src_rank",
            row_number().over(
              Window.partitionBy("source").orderBy(
                substring(md5(col("doc_id").cast("string").cast("binary")), 1, 15),
                col("doc_id"))))
          .filter(col("src_rank") <= 50)
          .select(col("doc_id"), col("tok"))
        graft.operators.Pack.packChunks(curated, "doc_id", "tok", SeqLen, col("doc_id"))
      },
      Some(s"""WITH base AS (
              |  SELECT doc_id, source,
              |    md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
              |    length(text) AS len,
              |    CAST(len(ws) AS INT) AS n_words,
              |    CAST(length(text) -
              |      length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS INT) AS punct_cnt,
              |    ${Text.sqlHits(Text.StopEn)} AS stop_cnt,
              |    CAST(length(regexp_extract_all(lower(text), '$TokenPat')) AS BIGINT) AS tok
              |  FROM (SELECT doc_id, source, text,
              |          list_filter(string_split_regex(lower(text), '\\s+'),
              |            x -> x != '') AS ws
              |        FROM documents)),
              |scored AS (
              |  SELECT *,
              |    least(1.0, n_words / 100.0) * 0.5
              |      + (1.0 - least(1.0, punct_cnt * 10.0 / len)) * 0.3
              |      + least(1.0, stop_cnt * 5.0 / n_words) * 0.2 AS quality,
              |    min(doc_id) OVER (PARTITION BY fp) AS keep
              |  FROM base),
              |curated AS (
              |  SELECT doc_id, tok FROM (
              |    SELECT doc_id, tok,
              |      row_number() OVER (PARTITION BY source
              |        ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 15), doc_id)
              |        AS src_rank
              |    FROM scored WHERE doc_id = keep AND quality >= 0.5)
              |  WHERE src_rank <= 50),
              |pre AS (
              |  SELECT doc_id, tok,
              |    CAST(COALESCE(sum(tok) OVER (ORDER BY doc_id
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS s0
              |  FROM curated WHERE tok > 0),
              |spans AS (
              |  SELECT doc_id, tok, s0, s0 + tok AS e0,
              |    unnest(generate_series(s0 // $SeqLen, (s0 + tok - 1) // $SeqLen)) AS chunk_id
              |  FROM pre)
              |SELECT doc_id, chunk_id,
              |  least(e0, (chunk_id + 1) * $SeqLen) - greatest(s0, chunk_id * $SeqLen)
              |    AS tok_in_chunk
              |FROM spans""".stripMargin),
      covers = Seq("ext-training-export")),

    // ------------------------------------------------------------------
    // One-pass multi-column profiling: per-column count/min/max/avg/stddev
    // computed in a SINGLE aggregation over ONE scan (no per-column
    // passes), then unpivoted to long form with stack(). The corpus-health
    // check every ingest runs; at 100 TB the single-scan property is the
    // whole point — PlanQualitySpec pins exactly one FileScan. Oracle
    // re-derives the same stats per column (its 4 scans are irrelevant —
    // only the values are compared). avg/stddev rounded at 6; min/max/sum
    // of these columns are exact decimals.
    QueryDef(
      "q_profile_columns",
      (s, dir) => {
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        val aggs = cols.flatMap(c => Seq(
          count(col(c)).as(s"n_$c"),
          min(col(c)).as(s"min_$c"),
          max(col(c)).as(s"max_$c"),
          round(avg(col(c)), 6).as(s"avg_$c"),
          round(stddev_samp(col(c)), 6).as(s"sd_$c")))
        val one = t(s, dir, "lineitem").agg(aggs.head, aggs.tail: _*)
        val stacked = cols
          .map(c => s"'$c', n_$c, min_$c, max_$c, avg_$c, sd_$c")
          .mkString(", ")
        one.selectExpr(
          s"stack(${cols.size}, $stacked) as (col, n_nonnull, min_v, max_v, avg_v, sd_v)")
      },
      Some {
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        cols.map { c =>
          s"""SELECT '$c' AS col, CAST(count($c) AS BIGINT) AS n_nonnull,
             |  min($c) AS min_v, max($c) AS max_v,
             |  round(avg($c), 6) AS avg_v, round(stddev_samp($c), 6) AS sd_v
             |FROM lineitem""".stripMargin
        }.mkString("\nUNION ALL\n")
      },
      covers = Seq("ext-profile-columns")),

    // ------------------------------------------------------------------
    // Corpus snapshot diff (the CDC/versioning op): two corpus versions —
    // derived deterministically from the fixture so both engines build the
    // identical pair — full-outer joined on the key, each doc classified
    // added/removed/changed by content digest. One shuffle per side at any
    // scale; output is the non-identical rows plus per-status counts a
    // pipeline would alert on.
    QueryDef(
      "q_corpus_diff",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val old = docs.filter(col("doc_id") % 7 =!= 0)
          .select(
            col("doc_id").as("k"),
            md5(when(col("doc_id") % 5 === 0, upper(col("text")))
              .otherwise(col("text"))).as("old_digest"))
        val neu = docs.filter(col("doc_id") % 11 =!= 0)
          .select(col("doc_id").as("k"), md5(col("text")).as("new_digest"))
        old.join(neu, Seq("k"), "full_outer")
          .withColumn(
            "status",
            when(col("old_digest").isNull, lit("added"))
              .when(col("new_digest").isNull, lit("removed"))
              .when(col("old_digest") =!= col("new_digest"), lit("changed"))
              .otherwise(lit("unchanged")))
          .filter(col("status") =!= "unchanged")
          .select(col("k").as("doc_id"), col("status"))
      },
      Some("""WITH old AS (
             |  SELECT doc_id AS k,
             |    md5(CASE WHEN doc_id % 5 = 0 THEN upper(text) ELSE text END) AS old_digest
             |  FROM documents WHERE doc_id % 7 != 0),
             |neu AS (
             |  SELECT doc_id AS k, md5(text) AS new_digest
             |  FROM documents WHERE doc_id % 11 != 0)
             |SELECT COALESCE(old.k, neu.k) AS doc_id,
             |  CASE WHEN old_digest IS NULL THEN 'added'
             |       WHEN new_digest IS NULL THEN 'removed'
             |       WHEN old_digest != new_digest THEN 'changed'
             |       ELSE 'unchanged' END AS status
             |FROM old FULL OUTER JOIN neu ON old.k = neu.k
             |WHERE old_digest IS NULL OR new_digest IS NULL OR old_digest != new_digest""".stripMargin),
      covers = Seq("ext-corpus-diff")),

    // ------------------------------------------------------------------
    // PII redaction: count and strip email addresses and IPv4 literals.
    // The fixture corpus is synthetic word salad, so the query first
    // derives a deterministic contact string per document FROM the table's
    // own key (both engines apply the identical derivation) — the redactor
    // then provably finds and removes non-trivial PII. Pure row-level
    // projection: zero shuffles, scale-free.
    QueryDef(
      "q_pii_redact",
      (s, dir) => {
        val txt = concat(
          col("text"), lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com from 10.0."), (col("doc_id") % 256).cast("string"),
          lit(".7"))
        val red = regexp_replace(
          regexp_replace(txt, EmailPat, "<EMAIL>"), IpPat, "<IP>")
        t(s, dir, "documents").select(
          col("doc_id"),
          size(regexp_extract_all(txt, lit(EmailPat), lit(0))).as("n_email"),
          size(regexp_extract_all(txt, lit(IpPat), lit(0))).as("n_ip"),
          length(red).as("red_len"),
          md5(red).as("red_digest"))
      },
      Some(s"""WITH d AS (
              |  SELECT doc_id,
              |    text || ' contact user' || CAST(doc_id AS VARCHAR) ||
              |      '@example.com from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7' AS txt
              |  FROM documents),
              |r AS (
              |  SELECT doc_id, txt,
              |    regexp_replace(regexp_replace(txt, '$EmailPat', '<EMAIL>', 'g'),
              |      '$IpPat', '<IP>', 'g') AS red
              |  FROM d)
              |SELECT doc_id,
              |  CAST(length(regexp_extract_all(txt, '$EmailPat')) AS INT) AS n_email,
              |  CAST(length(regexp_extract_all(txt, '$IpPat')) AS INT) AS n_ip,
              |  CAST(length(red) AS INT) AS red_len,
              |  md5(red) AS red_digest
              |FROM r""".stripMargin),
      covers = Seq("ext-pii-redact")),

    // ------------------------------------------------------------------
    // Temperature-based source mixing (the multilingual-corpus sampling
    // rule: p_i ∝ n_i^α with α < 1 flattens the source distribution so
    // head sources stop drowning the tail). Quotas are computed on the
    // per-source COUNTS (a tiny agg), then each source contributes its
    // quota of md5-priority-ranked docs. All quota arithmetic is INTEGER
    // (weights scaled to ⌊√n·10⁶⌋ before summing) — no float summation
    // order to disagree on. Selection is one row_number window per
    // source. (TopKPushdown does NOT fire here by design of its gates:
    // the filter bound is column-valued (rn <= quota) and the order key
    // is a string digest, not a double — a static `rn <= MixTargetN`
    // pre-filter would bound the join input but still not engage the
    // heap operator. At 100 TB the window itself is the honest cost:
    // one sort per source partition.)
    QueryDef(
      "q_temperature_mix",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        // unsourced docs can't take a quota: filtering them HERE (not
        // via the join's pushed-down isnotnull) keeps the counts
        // exchange canonically identical under both consumers below, so
        // the total-weight branch REUSES it instead of re-scanning the
        // corpus
        val docs = t(s, dir, "documents").filter(col("source").isNotNull)
        val counts = docs.groupBy("source")
          .agg(count(lit(1)).as("n"))
          .withColumn("w", floor(sqrt(col("n")) * lit(1000000)).cast("long"))
        // total weight as a broadcast 1-row agg OVER THE COUNTS FRAME
        // crossJoined back: the counts shuffle is shared by both
        // branches (exchange reuse), and unlike a partitionBy()-less
        // window this keeps WindowExec's single-partition warning out of
        // the bench log, where it would mask a real global-window
        // mistake
        val total = counts.agg(sum(col("w")).as("tw"))
        val quotas = counts
          .crossJoin(broadcast(total))
          .withColumn("quota", expr(s"($MixTargetN * w) div tw"))
        docs
          .withColumn("pri",
            substring(md5(col("doc_id").cast("string").cast("binary")), 1, 15))
          .withColumn("rn", row_number().over(
            Window.partitionBy("source").orderBy(col("pri"), col("doc_id"))))
          .join(broadcast(quotas.select("source", "quota")), Seq("source"))
          .filter(col("rn") <= col("quota"))
          .select(col("doc_id"), col("source"), col("rn").as("mix_rank"))
      },
      Some(s"""WITH q AS (
              |  SELECT source,
              |    CAST(floor(sqrt(count(*)) * 1000000) AS BIGINT) AS w
              |  FROM documents WHERE source IS NOT NULL GROUP BY 1),
              |quota AS (
              |  SELECT source, ($MixTargetN * w) // (SELECT sum(w) FROM q) AS quota
              |  FROM q),
              |ranked AS (
              |  SELECT doc_id, source,
              |    row_number() OVER (PARTITION BY source
              |      ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 15), doc_id)
              |      AS mix_rank
              |  FROM documents WHERE source IS NOT NULL)
              |SELECT doc_id, r.source, CAST(mix_rank AS INT) AS mix_rank
              |FROM ranked r JOIN quota USING (source)
              |WHERE mix_rank <= quota""".stripMargin),
      covers = Seq("ext-temperature-mix")),

    // ------------------------------------------------------------------
    // Data-quality constraint verification (operators.Quality — the
    // Deequ idea): a declarative check suite compiled into ONE
    // aggregation pass per table plus one anti-join per FK, each check a
    // (check_name, violations) row — the audit gate a curation pipeline
    // runs before promoting a snapshot. The uniqueness check is exact
    // (count distinct via Expand, one scan); the FK orphan check leaves
    // build-side choice to Catalyst/AQE (broadcast when the parent key
    // set is small, shuffle join otherwise).
    QueryDef(
      "q_dq_checks",
      (s, dir) => {
        import graft.operators.Quality
        import graft.operators.Quality.{Completeness, RowCheck, Uniqueness}
        val orders = t(s, dir, "orders")
        val li = t(s, dir, "lineitem")
        val ordersChecks = Quality.suite(orders, Seq(
          Uniqueness("orders_pk_unique", Seq("o_orderkey")),
          Completeness("orders_custkey_complete", "o_custkey"),
          RowCheck("orders_price_nonneg", col("o_totalprice") < 0)))
        val liChecks = Quality.suite(li, Seq(
          RowCheck("lineitem_qty_range",
            col("l_quantity") < 1 || col("l_quantity") > 50)))
        val evChecks = Quality.suite(t(s, dir, "events"), Seq(
          RowCheck("events_type_domain",
            !col("event_type").isin("click", "view", "purchase", "signup", "error"))))
        val docChecks = Quality.suite(t(s, dir, "documents"), Seq(
          RowCheck("documents_nonempty", length(col("text")) === 0)))
        val fk = Quality.fkOrphans(
          "lineitem_fk_orders", li, "l_orderkey", orders, "o_orderkey")
        ordersChecks
          .unionByName(liChecks).unionByName(evChecks)
          .unionByName(docChecks).unionByName(fk)
      },
      Some("""SELECT 'orders_pk_unique' AS check_name,
             |  CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS violations
             |FROM orders
             |UNION ALL
             |SELECT 'orders_custkey_complete',
             |  CAST(count(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT) FROM orders
             |UNION ALL
             |SELECT 'orders_price_nonneg',
             |  CAST(count(*) FILTER (WHERE o_totalprice < 0) AS BIGINT) FROM orders
             |UNION ALL
             |SELECT 'lineitem_qty_range',
             |  CAST(count(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50) AS BIGINT)
             |FROM lineitem
             |UNION ALL
             |SELECT 'events_type_domain',
             |  CAST(count(*) FILTER (WHERE event_type NOT IN
             |    ('click', 'view', 'purchase', 'signup', 'error')) AS BIGINT)
             |FROM events
             |UNION ALL
             |SELECT 'documents_nonempty',
             |  CAST(count(*) FILTER (WHERE length(text) = 0) AS BIGINT) FROM documents
             |UNION ALL
             |SELECT 'lineitem_fk_orders',
             |  CAST(count(*) AS BIGINT)
             |FROM lineitem l ANTI JOIN orders o ON l.l_orderkey = o.o_orderkey
             |  WHERE l.l_orderkey IS NOT NULL""".stripMargin),
      covers = Seq("ext-dq-checks", "S7")),

    // ------------------------------------------------------------------
    // PRIVACY audit (operators.Quality.kAnonymity): quasi-identifier
    // groups of customers that re-identify their members (k < 10) or
    // leak the sensitive balance bracket through group homogeneity
    // (l < 3 distinct brackets — the attack k-anonymity alone misses).
    // The release gate a training-data pipeline runs before publishing
    // user-derived tables; complements the PII redaction faces, which
    // scrub VALUES but cannot see GROUP-level disclosure. One shuffle on
    // the QI, both measures in the same agg pass. Bracket boundaries are
    // exact in both engines: balances with two decimals are
    // double-exact, and the /2000 boundary cases are whole thousands.
    QueryDef(
      "q_k_anonymity",
      (s, dir) =>
        graft.operators.Quality.kAnonymity(
          t(s, dir, "customer"),
          quasi = Seq("c_nationkey", "c_mktsegment"),
          sensitive = floor(col("c_acctbal") / lit(2000.0)),
          k = 10, l = 3),
      Some("""SELECT c_nationkey, c_mktsegment,
             |  CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(count(DISTINCT CAST(floor(c_acctbal / 2000.0) AS BIGINT)) AS BIGINT)
             |    AS n_sensitive,
             |  count(*) < 10 AS k_violation,
             |  count(DISTINCT CAST(floor(c_acctbal / 2000.0) AS BIGINT)) < 3 AS l_violation
             |FROM customer GROUP BY 1, 2
             |HAVING count(*) < 10
             |   OR count(DISTINCT CAST(floor(c_acctbal / 2000.0) AS BIGINT)) < 3""".stripMargin),
      covers = Seq("ext-privacy-k-anonymity")),

    // ------------------------------------------------------------------
    // DSIR-style importance resampling (Xie et al., arXiv:2302.03169):
    // rank raw documents by how target-like their unigram distribution
    // is — log p_target(doc) − log p_raw(doc) under Laplace-smoothed
    // unigram LMs — and keep the top slice. The data-mixing primitive
    // for steering a 100 TB raw crawl toward a curated target domain
    // (here: the `lang='en'` slice stands in for the target corpus).
    // Plan shape: one tokenize pass feeds both LM count aggregations and
    // the per-doc tf frame; the per-TERM log-ratio table (vocab-sized,
    // NOT corpus-sized) joins tf on the term — two term-keyed shuffles +
    // one doc-keyed agg, no driver-side state. At 100 TB the paper's
    // hashed-n-gram trick bounds the ratio table to a fixed 2^k width
    // (same plan, pmod(xxhash64(w)) as the join key); exact tokens here
    // keep the oracle engine-independent. Per-(doc,term) contributions
    // round at 9 before the doc sum (the PageRank discipline), the doc
    // score at 6, and the top-100 cut breaks ties on doc_id — the
    // selected SET is deterministic across engines.
    QueryDef(
      "q_dsir_sample",
      (s, dir) => {
        val tok = t(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            explode(Text.words(col("text"))).as("w"))
        val v = tok.agg(countDistinct(col("w")).as("v"))
        val tgt = tok.filter(col("lang") === "en")
        val tcnt = tgt.groupBy("w").agg(count(lit(1)).as("ct"))
        val tt = tgt.agg(count(lit(1)).as("t"))
        val scnt = tok.groupBy("w").agg(count(lit(1)).as("cs"))
        val ss = tok.agg(count(lit(1)).as("s"))
        val ratio = scnt.join(tcnt, Seq("w"), "left")
          .crossJoin(broadcast(tt)).crossJoin(broadcast(ss)).crossJoin(broadcast(v))
          .select(col("w"),
            round(
              log((coalesce(col("ct"), lit(0L)) + 1.0) / (col("t") + col("v"))) -
                log((col("cs") + 1.0) / (col("s") + col("v"))),
              9).as("lr"))
        val tf = tok.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
        tf.join(ratio, "w")
          .select(col("doc_id"), round(col("tf") * col("lr"), 9).as("c"))
          .groupBy("doc_id").agg(round(sum("c"), 6).as("dsir"))
          .orderBy(col("dsir").desc, col("doc_id")).limit(100)
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, lang,
             |    unnest(list_filter(string_split_regex(lower(text), '\s+'),
             |      x -> x != '')) AS w
             |  FROM documents),
             |v AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v FROM tok),
             |tcnt AS (SELECT w, CAST(count(*) AS BIGINT) AS ct FROM tok
             |  WHERE lang = 'en' GROUP BY 1),
             |tt AS (SELECT CAST(count(*) AS BIGINT) AS t FROM tok WHERE lang = 'en'),
             |scnt AS (SELECT w, CAST(count(*) AS BIGINT) AS cs FROM tok GROUP BY 1),
             |ss AS (SELECT CAST(count(*) AS BIGINT) AS s FROM tok),
             |ratio AS (
             |  SELECT w, round(ln((COALESCE(ct, 0) + 1.0) / (t + v)) -
             |    ln((cs + 1.0) / (s + v)), 9) AS lr
             |  FROM scnt LEFT JOIN tcnt USING (w)
             |  CROSS JOIN tt CROSS JOIN ss CROSS JOIN v),
             |tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
             |  FROM tok GROUP BY 1, 2)
             |SELECT doc_id, round(sum(round(tf * lr, 9)), 6) AS dsir
             |FROM tf JOIN ratio USING (w) GROUP BY 1
             |ORDER BY dsir DESC, doc_id LIMIT 100""".stripMargin),
      covers = Seq("ext-dsir-sample"))
  )
}
