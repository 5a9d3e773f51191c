package graft.queries

import graft.QueryDef
import graft.QueryDef.t
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table: quality stats,
  * token counting, language-ID heuristic, document fingerprinting.
  *
  * Everything is a native column expression (whole-stage codegen'd, no
  * UDFs), so at 100 TB these run as a single parquet scan + project with
  * the text column pruned to exactly what's read.
  */
object Text {

  /** whitespace words, lowercased, empties dropped — native kernel
    * (the filter(split(lower)) HOF pair is interpreted per element).
    */
  private[queries] def words(c: Column): Column = graft.functions.TextExprs.wordTokens(c)

  /** BPE-ish token pattern: letter runs, digit runs, single punctuation. */
  private val TokenPat = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  private[queries] val StopEn = Seq("the", "a", "and", "of", "to", "is")
  private val StopDe = Seq("der", "die", "und", "das", "ist")
  private val StopFr = Seq("le", "la", "et", "les", "est")
  private val StopEs = Seq("el", "los", "que", "es", "las")

  private[queries] def hitCount(ws: Column, stop: Seq[String]): Column =
    size(filter(ws, x => x.isin(stop.map(_.asInstanceOf[Any]): _*)))

  private[queries] def sqlHits(stop: Seq[String]): String =
    s"CAST(length(list_filter(ws, x -> list_contains([${stop.map("'" + _ + "'").mkString(", ")}], x))) AS INT)"

  val defs: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    // Quality scoring + token counting: length/punct/stopword ratios and a
    // composite score, all derived from integer counts so the arithmetic is
    // bit-identical across engines.
    QueryDef(
      "q_text_stats",
      (s, dir) => {
        val base = t(s, dir, "documents")
          .select(
            col("doc_id"),
            length(col("text")).as("len"),
            size(words(col("text"))).as("n_words"),
            size(regexp_extract_all(lower(col("text")), lit(TokenPat), lit(0)))
              .as("n_tokens"),
            (length(col("text")) -
              length(regexp_replace(col("text"), "[^a-zA-Z0-9\\s]", "")))
              .as("punct_cnt"),
            hitCount(words(col("text")), StopEn).as("stop_cnt"))
        base.select(
          col("doc_id"),
          col("n_words"),
          col("n_tokens"),
          col("punct_cnt"),
          col("stop_cnt"),
          // all ratios are row-level arithmetic over integer counts — the op
          // trees are identical in both engines, so doubles are bit-exact
          // with NO rounding (round() is the only divergent op; see
          // Relational for the half-boundary analysis).
          (col("punct_cnt") * lit(1.0) / col("len")).as("punct_ratio"),
          (col("stop_cnt") * lit(1.0) / col("n_words")).as("stop_ratio"),
          (least(lit(1.0), col("n_words") / lit(100.0)) * 0.5 +
            (lit(1.0) - least(lit(1.0), col("punct_cnt") * lit(10.0) / col("len"))) * 0.3 +
            least(lit(1.0), col("stop_cnt") * lit(5.0) / col("n_words")) * 0.2)
            .as("quality"))
      },
      Some(s"""WITH base AS (
              |  SELECT doc_id, length(text) AS len,
              |    CAST(length(list_filter(string_split_regex(lower(text), '\\s+'),
              |      x -> x != '')) AS INT) AS n_words,
              |    CAST(length(regexp_extract_all(lower(text), '$TokenPat')) AS INT) AS n_tokens,
              |    CAST(length(text) -
              |      length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS INT) AS punct_cnt,
              |    CAST(length(list_filter(string_split_regex(lower(text), '\\s+'),
              |      x -> list_contains([${StopEn.map("'" + _ + "'").mkString(", ")}], x))) AS INT) AS stop_cnt
              |  FROM documents)
              |SELECT doc_id, n_words, n_tokens, punct_cnt, stop_cnt,
              |  punct_cnt * 1.0 / len AS punct_ratio,
              |  stop_cnt * 1.0 / n_words AS stop_ratio,
              |  least(1.0, n_words / 100.0) * 0.5
              |      + (1.0 - least(1.0, punct_cnt * 10.0 / len)) * 0.3
              |      + least(1.0, stop_cnt * 5.0 / n_words) * 0.2 AS quality
              |FROM base""".stripMargin),
      covers = Seq("ext-quality", "ext-tokens")),

    // ------------------------------------------------------------------
    // Language-ID: marker-word hit counts per language, argmax with a fixed
    // tie-break order (en > de > fr > es).
    QueryDef(
      "q_text_langid",
      (s, dir) => {
        val base = t(s, dir, "documents")
          .select(col("doc_id"), words(col("text")).as("ws"))
          .select(
            col("doc_id"),
            hitCount(col("ws"), StopEn).as("c_en"),
            hitCount(col("ws"), StopDe).as("c_de"),
            hitCount(col("ws"), StopFr).as("c_fr"),
            hitCount(col("ws"), StopEs).as("c_es"))
        base.withColumn(
          "pred_lang",
          when(col("c_en") >= col("c_de") && col("c_en") >= col("c_fr") &&
            col("c_en") >= col("c_es"), "en")
            .when(col("c_de") >= col("c_fr") && col("c_de") >= col("c_es"), "de")
            .when(col("c_fr") >= col("c_es"), "fr")
            .otherwise("es"))
      },
      Some(s"""WITH base AS (
              |  SELECT doc_id,
              |    ${sqlHits(StopEn)} AS c_en, ${sqlHits(StopDe)} AS c_de,
              |    ${sqlHits(StopFr)} AS c_fr, ${sqlHits(StopEs)} AS c_es
              |  FROM (SELECT doc_id,
              |          list_filter(string_split_regex(lower(text), '\\s+'),
              |            x -> x != '') AS ws
              |        FROM documents))
              |SELECT doc_id, c_en, c_de, c_fr, c_es,
              |  CASE WHEN c_en >= c_de AND c_en >= c_fr AND c_en >= c_es THEN 'en'
              |       WHEN c_de >= c_fr AND c_de >= c_es THEN 'de'
              |       WHEN c_fr >= c_es THEN 'fr'
              |       ELSE 'es' END AS pred_lang
              |FROM base""".stripMargin),
      covers = Seq("ext-langid")),

    // ------------------------------------------------------------------
    // Repetition stats (C4-style filter signal): duplicate-word fraction
    // per document from total vs distinct word counts — integer ops, so
    // the derived double is bit-exact across engines.
    QueryDef(
      "q_text_repetition",
      (s, dir) =>
        t(s, dir, "documents")
          .select(
            col("doc_id"),
            size(words(col("text"))).as("n_words"),
            size(graft.functions.TextExprs.wordShingles(col("text"), 1)).as("n_distinct"))
          .filter(col("n_words") > 0)
          .withColumn(
            "dup_fraction",
            lit(1.0) - col("n_distinct") * lit(1.0) / col("n_words")),
      Some("""SELECT doc_id,
             |  CAST(len(ws) AS INT) AS n_words,
             |  CAST(len(list_distinct(ws)) AS INT) AS n_distinct,
             |  1.0 - len(list_distinct(ws)) * 1.0 / len(ws) AS dup_fraction
             |FROM (SELECT doc_id,
             |        list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS ws
             |      FROM documents)
             |WHERE len(ws) > 0""".stripMargin),
      covers = Seq("ext-repetition")),

    // ------------------------------------------------------------------
    // Corpus vocabulary stats: global top-20 tokens (count desc, token
    // tie-break). The explode shuffles once with map-side combine; the
    // top-k is a TakeOrdered, never a global sort.
    QueryDef(
      "q_token_freq",
      (s, dir) =>
        t(s, dir, "documents")
          .select(explode(words(col("text"))).as("w"))
          .groupBy("w")
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("w"))
          .limit(20),
      Some("""SELECT w, CAST(count(*) AS BIGINT) AS n
             |FROM (SELECT unnest(list_filter(
             |        string_split_regex(lower(text), '\s+'), x -> x != '')) AS w
             |      FROM documents)
             |GROUP BY w ORDER BY n DESC, w LIMIT 20""".stripMargin),
      covers = Seq("ext-token-freq")),

    // ------------------------------------------------------------------
    // Composed cleaning pass — the actual shape of a training-data
    // pipeline stage: keep each exact-dup cluster's canonical doc (min id
    // per normalized fingerprint) that also clears the quality bar.
    // One window over fp + row-level scoring; quality doubles are
    // bit-exact (same op tree both engines, proven by q_text_stats).
    QueryDef(
      "q_corpus_clean",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val base = t(s, dir, "documents")
          .select(
            col("doc_id"),
            md5(trim(regexp_replace(lower(col("text")), "\\s+", " ")).cast("binary"))
              .as("fp"),
            length(col("text")).as("len"),
            size(words(col("text"))).as("n_words"),
            (length(col("text")) -
              length(regexp_replace(col("text"), "[^a-zA-Z0-9\\s]", "")))
              .as("punct_cnt"),
            hitCount(words(col("text")), StopEn).as("stop_cnt"))
          .withColumn(
            "quality",
            least(lit(1.0), col("n_words") / lit(100.0)) * 0.5 +
              (lit(1.0) - least(lit(1.0), col("punct_cnt") * lit(10.0) / col("len"))) * 0.3 +
              least(lit(1.0), col("stop_cnt") * lit(5.0) / col("n_words")) * 0.2)
        base
          .withColumn("keep", min("doc_id").over(Window.partitionBy("fp")))
          .filter(col("doc_id") === col("keep") && col("quality") >= 0.5)
          .select(col("doc_id"), col("n_words"), col("quality"))
      },
      Some(s"""WITH base AS (
              |  SELECT doc_id,
              |    md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
              |    length(text) AS len,
              |    CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
              |      x -> x != '')) AS INT) AS n_words,
              |    CAST(length(text) -
              |      length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS INT) AS punct_cnt,
              |    ${sqlHits(StopEn)} AS stop_cnt
              |  FROM (SELECT doc_id, text,
              |          list_filter(string_split_regex(lower(text), '\\s+'),
              |            x -> x != '') AS ws
              |        FROM documents)),
              |scored AS (
              |  SELECT doc_id, fp, n_words,
              |    least(1.0, n_words / 100.0) * 0.5
              |      + (1.0 - least(1.0, punct_cnt * 10.0 / len)) * 0.3
              |      + least(1.0, stop_cnt * 5.0 / n_words) * 0.2 AS quality
              |  FROM base),
              |canon AS (SELECT fp, min(doc_id) AS keep FROM scored GROUP BY fp)
              |SELECT doc_id, n_words, quality
              |FROM scored JOIN canon USING (fp)
              |WHERE doc_id = keep AND quality >= 0.5""".stripMargin),
      covers = Seq("ext-corpus-clean")),

    // ------------------------------------------------------------------
    // Filter-cascade FUNNEL: the per-rule drop accounting every curation
    // pipeline publishes next to its cleaned corpus — for each rule in
    // cascade order, how many documents violate it at all (marginal),
    // how many the cascade drops AT that rule (passed every earlier
    // rule, failed this one), and how many survive through it. ONE
    // aggregation pass: every number is a conditional sum over the same
    // scan (partial-aggregated map-side, the exchange carries one row),
    // then the single row unpivots to a row per rule — the Quality.suite
    // positional-literal shape, nothing interpolated into SQL. At
    // 100 TB this is the difference between one corpus read and one
    // read per rule × stage.
    QueryDef(
      "q_filter_funnel",
      (s, dir) => {
        val d = t(s, dir, "documents").select(
          length(col("text")).as("len"),
          size(words(col("text"))).as("n_words"),
          (length(col("text")) -
            length(regexp_replace(col("text"), "[^a-zA-Z0-9\\s]", "")))
            .as("punct_cnt"),
          (length(col("text")) -
            length(regexp_replace(col("text"), "[0-9]", "")))
            .as("digit_cnt"))
        // pass-predicates, cascade order (cheap structural rules first)
        val rules: Seq[(String, Column)] = Seq(
          "min_words_10" -> (col("n_words") >= 10),
          "punct_ratio_20" -> (col("punct_cnt") * 5 <= col("len")),
          "digit_ratio_10" -> (col("digit_cnt") * 10 <= col("len")))
        val preds = rules.map(_._2)
        def through(i: Int): Column = preds.take(i + 1).reduce(_ && _)
        val aggs = rules.indices.flatMap { i =>
          val pre = if (i == 0) lit(true) else through(i - 1)
          Seq(
            sum(when(!preds(i), 1L).otherwise(0L)).as(s"v$i"),
            sum(when(pre && !preds(i), 1L).otherwise(0L)).as(s"d$i"),
            sum(when(through(i), 1L).otherwise(0L)).as(s"s$i"))
        }
        d.agg(aggs.head, aggs.tail: _*)
          .select(explode(array(rules.indices.map(i =>
            struct(
              lit(rules(i)._1).as("rule"),
              col(s"v$i").as("n_violating"),
              col(s"d$i").as("n_dropped_here"),
              col(s"s$i").as("n_surviving_after"))): _*)).as("kv"))
          .select(col("kv.rule"), col("kv.n_violating"),
            col("kv.n_dropped_here"), col("kv.n_surviving_after"))
      },
      Some("""WITH f AS (
             |  SELECT
             |    length(text) AS len,
             |    CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
             |      x -> x != '')) AS INT) AS n_words,
             |    CAST(length(text) -
             |      length(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g')) AS INT) AS punct_cnt,
             |    CAST(length(text) -
             |      length(regexp_replace(text, '[0-9]', '', 'g')) AS INT) AS digit_cnt
             |  FROM documents),
             |p AS (
             |  SELECT (n_words >= 10) AS p0,
             |    (punct_cnt * 5 <= len) AS p1,
             |    (digit_cnt * 10 <= len) AS p2
             |  FROM f),
             |a AS (SELECT
             |  CAST(sum(CASE WHEN NOT p0 THEN 1 ELSE 0 END) AS BIGINT) AS v0,
             |  CAST(sum(CASE WHEN NOT p0 THEN 1 ELSE 0 END) AS BIGINT) AS d0,
             |  CAST(sum(CASE WHEN p0 THEN 1 ELSE 0 END) AS BIGINT) AS s0,
             |  CAST(sum(CASE WHEN NOT p1 THEN 1 ELSE 0 END) AS BIGINT) AS v1,
             |  CAST(sum(CASE WHEN p0 AND NOT p1 THEN 1 ELSE 0 END) AS BIGINT) AS d1,
             |  CAST(sum(CASE WHEN p0 AND p1 THEN 1 ELSE 0 END) AS BIGINT) AS s1,
             |  CAST(sum(CASE WHEN NOT p2 THEN 1 ELSE 0 END) AS BIGINT) AS v2,
             |  CAST(sum(CASE WHEN p0 AND p1 AND NOT p2 THEN 1 ELSE 0 END) AS BIGINT) AS d2,
             |  CAST(sum(CASE WHEN p0 AND p1 AND p2 THEN 1 ELSE 0 END) AS BIGINT) AS s2
             |  FROM p)
             |SELECT 'min_words_10' AS rule, v0 AS n_violating,
             |  d0 AS n_dropped_here, s0 AS n_surviving_after FROM a
             |UNION ALL SELECT 'punct_ratio_20', v1, d1, s1 FROM a
             |UNION ALL SELECT 'digit_ratio_10', v2, d2, s2 FROM a""".stripMargin),
      covers = Seq("ext-filter-funnel")),

    // ------------------------------------------------------------------
    // Winnowing fingerprints (rolling-hash sketch with a substring-
    // containment guarantee — see graft.operators.Winnow): k-gram hashes,
    // sliding-window minima, distinct. Exploded (doc_id, fp) rows are the
    // inverted-index layout the 100 TB dedup path partitions on.
    QueryDef(
      "q_text_winnow",
      (s, dir) =>
        graft.operators.Winnow.fingerprintRows(t(s, dir, "documents"), "doc_id", "text"),
      Some(graft.operators.Winnow.oracleSql()),
      covers = Seq("ext-fingerprint-winnow")),

    // ------------------------------------------------------------------
    // PII scrub + pseudonymization — the privacy pass of a training-data
    // pipeline: numeric literals redacted from the free-form props payload
    // (the digit-run regex stands in for SSN/phone patterns) and the user
    // key replaced by a stable one-way pseudonym so joins still work but
    // the identifier never leaves the pipeline. Pure row-level projection:
    // zero shuffles, whole-stage codegen'd, embarrassingly parallel.
    QueryDef(
      "q_pii_scrub",
      (s, dir) =>
        graft.engine.Session.table(s, dir, "events")
          .select(
            col("event_id"),
            substring(md5(col("user_id").cast("string")), 1, 12).as("user_pseud"),
            regexp_replace(col("props"), "[0-9]+", "#").as("props_clean"),
            size(regexp_extract_all(col("props"), lit("[0-9]+"), lit(0))).as("n_redacted")),
      Some("""SELECT event_id,
             |  substr(md5(CAST(user_id AS VARCHAR)), 1, 12) AS user_pseud,
             |  regexp_replace(props, '[0-9]+', '#', 'g') AS props_clean,
             |  CAST(len(regexp_extract_all(props, '[0-9]+')) AS INT) AS n_redacted
             |FROM events""".stripMargin),
      covers = Seq("ext-pii-scrub")),

    // ------------------------------------------------------------------
    // TF-IDF: term frequencies per doc, document frequencies per term, and
    // the top-3 salient terms per document. Ranking is on the INTEGER key
    // (tf desc, df asc, term) — deterministic across engines — while the
    // real-valued tfidf = tf·ln(N/df) is emitted rounded (ln differs at the
    // ulp between libm and the JVM). Corpus size N is a 1-row broadcast,
    // never a driver constant, so the plan is scale-independent: explode →
    // two keyed shuffles (doc, term) → window top-k, all partial-agg'd.
    QueryDef(
      "q_tfidf",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = t(s, dir, "documents")
        val tf = docs
          .select(col("doc_id"), explode(words(col("text"))).as("w"))
          .groupBy("doc_id", "w")
          .agg(count(lit(1)).as("tf"))
        val dfreq = tf.groupBy("w").agg(count(lit(1)).as("df"))
        val n = docs.select(countDistinct("doc_id").as("n_docs"))
        val rankW = Window.partitionBy("doc_id")
          .orderBy(col("tf").desc, col("df").asc, col("w").asc)
        tf.join(dfreq, "w")
          .crossJoin(broadcast(n))
          .withColumn("rk", row_number().over(rankW))
          .filter(col("rk") <= 3)
          .select(
            col("doc_id"),
            col("rk"),
            col("w"),
            col("tf"),
            col("df"),
            round(col("tf") * log(col("n_docs") * lit(1.0) / col("df")), 6)
              .as("tfidf"))
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, unnest(list_filter(
             |      string_split_regex(lower(text), '\s+'), x -> x != '')) AS w
             |  FROM documents),
             |tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) tf FROM tok GROUP BY 1, 2),
             |dfreq AS (SELECT w, CAST(count(*) AS BIGINT) df FROM tf GROUP BY 1),
             |n AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) n_docs FROM documents)
             |SELECT doc_id, CAST(rk AS INT) AS rk, w, tf, df,
             |  round(tf * ln(n_docs * 1.0 / df), 6) AS tfidf
             |FROM (SELECT doc_id, w, tf, df, n_docs,
             |        row_number() OVER
             |          (PARTITION BY doc_id ORDER BY tf DESC, df ASC, w ASC) AS rk
             |      FROM tf JOIN dfreq USING (w) CROSS JOIN n)
             |WHERE rk <= 3""".stripMargin),
      covers = Seq("ext-tfidf")),

    // ------------------------------------------------------------------
    // Context-window CHUNKING: overlapping fixed-size word windows
    // (size 64, stride 48 → 16-word overlap) — the prep step that turns
    // variable-length documents into trainable sequences. One generate per
    // doc (sequence + posexplode of slice), no shuffle at all: chunking
    // 100 TB is a pure scan, and chunk rows inherit the input partitioning.
    QueryDef(
      "q_doc_chunks",
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"), words(col("text")).as("ws"))
          .withColumn("n", size(col("ws")))
          .filter(col("n") >= 1)
          .select(
            col("doc_id"),
            col("ws"),
            col("n"),
            explode(sequence(lit(1), col("n"), lit(48))).as("start"))
          .select(
            col("doc_id"),
            col("start"),
            concat_ws(" ", slice(col("ws"), col("start"), lit(64))).as("chunk"),
            size(slice(col("ws"), col("start"), lit(64))).as("n_chunk")),
      Some("""WITH t AS (
             |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
             |    x -> x != '') AS ws
             |  FROM documents),
             |s AS (
             |  SELECT doc_id, ws, len(ws) AS n,
             |    unnest(range(1, len(ws) + 1, 48)) AS start
             |  FROM t WHERE len(ws) >= 1)
             |SELECT doc_id, CAST(start AS INT) AS start,
             |  array_to_string(ws[start:least(start + 63, n)], ' ') AS chunk,
             |  CAST(len(ws[start:least(start + 63, n)]) AS INT) AS n_chunk
             |FROM s""".stripMargin),
      covers = Seq("ext-doc-chunks")),

    // ------------------------------------------------------------------
    // Document fingerprint: md5 over whitespace-normalized lowercase text —
    // the exact-dedup key that survives formatting noise.
    QueryDef(
      "q_text_fingerprint",
      (s, dir) =>
        t(s, dir, "documents")
          .select(
            col("doc_id"),
            md5(trim(regexp_replace(lower(col("text")), "\\s+", " ")).cast("binary"))
              .as("fp")),
      Some("""SELECT doc_id,
             |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
             |FROM documents""".stripMargin),
      covers = Seq("ext-fingerprint")),

    // ------------------------------------------------------------------
    // Unicode NFC canonicalization (graft.functions.NfcNormalize, a native
    // codegen expression over java.text.Normalizer — no Spark built-in
    // exposes UAX #15). The test corpus is pure ASCII, so the query
    // manufactures decomposed input both engines can reproduce exactly:
    // every 'e' becomes 'e' + U+0301 (combining acute); NFC must compose
    // the pair back to precomposed 'é' (U+00E9), shortening the string by
    // one codepoint per 'e'. Hash is over the normalized UTF-8 bytes, so
    // a composition mismatch anywhere flips `fp`.
    QueryDef(
      "q_unicode_norm",
      (s, dir) =>
        t(s, dir, "documents")
          .select(
            col("doc_id"),
            // NB: Spark chr() is mod-256 ASCII — it can NOT build U+0301;
            // the combining mark comes in as a Scala \u escape instead.
            regexp_replace(col("text"), "e", "e\u0301").as("decomposed"))
          .select(
            col("doc_id"),
            md5(graft.functions.TextExprs.nfc(col("decomposed")).cast("binary")).as("fp"),
            length(col("decomposed")).as("n_raw"),
            length(graft.functions.TextExprs.nfc(col("decomposed"))).as("n_nfc")),
      Some("""SELECT doc_id,
             |  md5(nfc_normalize(replace(text, 'e', 'e' || chr(769)))) AS fp,
             |  CAST(length(replace(text, 'e', 'e' || chr(769))) AS INT) AS n_raw,
             |  CAST(length(nfc_normalize(replace(text, 'e', 'e' || chr(769)))) AS INT) AS n_nfc
             |FROM documents""".stripMargin),
      covers = Seq("ext-unicode-nfc")),

    // ------------------------------------------------------------------
    // Unigram language-model quality score: train P(w) = c(w)/total on the
    // corpus itself, score each document by its mean token log-probability
    // — the classic perplexity-based quality filter of LLM data pipelines.
    // Scale shape: the exploded token stream shuffles ONCE (map-side
    // combined to vocabulary size); the trained model is vocabulary-sized
    // and broadcast back over the stream, so scoring is shuffle-free and
    // the final per-doc agg moves only (doc_id, partial-sum) pairs. The
    // mean of logs is FP-order-dependent → round(6) in both engines.
    QueryDef(
      "q_lm_quality",
      (s, dir) => {
        val toks = t(s, dir, "documents")
          .select(col("doc_id"), explode(words(col("text"))).as("w"))
        val uni = toks.groupBy("w").agg(count(lit(1)).as("c"))
        val tot = uni.agg(sum("c").cast("double").as("n"))
        toks
          .join(broadcast(uni), "w")
          .crossJoin(broadcast(tot))
          .groupBy("doc_id")
          .agg(round(avg(log(col("c") / col("n"))), 6).as("lm_score"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |    unnest(list_filter(string_split_regex(lower(text), '\s+'),
             |      x -> x != '')) AS w
             |  FROM documents),
             |uni AS (SELECT w, count(*) AS c FROM toks GROUP BY 1),
             |tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM uni)
             |SELECT doc_id, round(avg(ln(c / n)), 6) AS lm_score
             |FROM toks JOIN uni USING (w) CROSS JOIN tot
             |GROUP BY 1""".stripMargin),
      covers = Seq("ext-lm-quality")),

    // ------------------------------------------------------------------
    // Tokenizer-vocabulary coverage: train a top-256 frequency vocabulary
    // (ties broken by token, so the cut line is deterministic), then score
    // every document's fraction of token OCCURRENCES covered — the
    // standard pre-training question "how much of this corpus does my
    // tokenizer represent without fallback". Scale shape: the vocabulary
    // is one map-side-combined token count + TakeOrdered(256); the corpus
    // pass probes it as a broadcast — the 100 TB side is never shuffled
    // except the per-doc count agg.
    QueryDef(
      "q_vocab_coverage",
      (s, dir) => {
        val tok = t(s, dir, "documents")
          .select(col("doc_id"), explode(words(col("text"))).as("w"))
        val vocab = tok.groupBy("w").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("w")).limit(256)
          .select(col("w"), lit(1).as("hit"))
        tok
          .join(broadcast(vocab), Seq("w"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"), count(col("hit")).as("n_in_vocab"))
          // single int→double division: bit-exact across engines, no round
          .withColumn("coverage", col("n_in_vocab") * lit(1.0) / col("n_tokens"))
      },
      Some("""WITH tok AS (
             |  SELECT doc_id,
             |    unnest(list_filter(string_split_regex(lower(text), '\s+'),
             |      x -> x != '')) AS w
             |  FROM documents),
             |vocab AS (
             |  SELECT w FROM (SELECT w, count(*) AS n FROM tok GROUP BY 1)
             |  ORDER BY n DESC, w LIMIT 256)
             |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             |  CAST(count(v.w) AS BIGINT) AS n_in_vocab,
             |  count(v.w) * 1.0 / count(*) AS coverage
             |FROM tok t LEFT JOIN vocab v ON t.w = v.w
             |GROUP BY 1""".stripMargin),
      covers = Seq("ext-vocab-coverage")),

    // ------------------------------------------------------------------
    // BM25 retrieval scoring against a fixed 3-term query. The classic
    // full-text ranking function, and the scale shape matters: document
    // frequencies are computed ONLY for the query terms (the filter runs
    // before the df aggregation, so the stats frame is 3 rows →
    // broadcast), the average length is a 1-row aggregate, and the corpus
    // side is scan + explode + filter + per-doc agg — one doc_id shuffle.
    // Per-term contributions are rounded to 9 decimals before the ≤3-term
    // sum (the PageRank trick) so engine-side summation order can't move
    // the 6-decimal output.
    QueryDef(
      "q_bm25",
      (s, dir) => {
        val terms = Seq("hash", "vector", "stream")
        val k1 = 1.2
        val b = 0.75
        val docs = t(s, dir, "documents")
        val tok = docs.select(col("doc_id"), explode(words(col("text"))).as("w"))
        val lens = tok.groupBy("doc_id").agg(count(lit(1)).as("len"))
        val avgl = lens.agg(avg(col("len")).as("avgl"))
        val n = docs.select(count(lit(1)).as("n"))
        val qtok = tok.filter(col("w").isin(terms: _*))
        val df = qtok.groupBy("w").agg(countDistinct(col("doc_id")).as("df"))
        val tf = qtok.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
        tf.join(broadcast(df), "w")
          .join(lens, "doc_id")
          .crossJoin(broadcast(avgl))
          .crossJoin(broadcast(n))
          .select(
            col("doc_id"),
            round(
              log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
                (col("tf") * (k1 + 1)) /
                (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("len") / col("avgl"))),
              9).as("contrib"))
          .groupBy("doc_id")
          .agg(round(sum("contrib"), 6).as("bm25"))
      },
      Some("""WITH tok AS (
             |  SELECT doc_id,
             |    unnest(list_filter(string_split_regex(lower(text), '\s+'),
             |      x -> x != '')) AS w
             |  FROM documents),
             |lens AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS len FROM tok GROUP BY 1),
             |avgl AS (SELECT avg(len) AS avgl FROM lens),
             |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
             |qtok AS (SELECT doc_id, w FROM tok WHERE w IN ('hash', 'vector', 'stream')),
             |df AS (SELECT w, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM qtok GROUP BY 1),
             |tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM qtok GROUP BY 1, 2),
             |contrib AS (
             |  SELECT tf.doc_id,
             |    round(ln((n.n - df.df + 0.5) / (df.df + 0.5) + 1.0) *
             |      (tf.tf * (1.2 + 1)) /
             |      (tf.tf + 1.2 * (1 - 0.75 + 0.75 * lens.len / avgl.avgl)),
             |      9) AS c
             |  FROM tf JOIN df USING (w) JOIN lens USING (doc_id)
             |  CROSS JOIN avgl CROSS JOIN n)
             |SELECT doc_id, round(sum(c), 6) AS bm25 FROM contrib GROUP BY 1""".stripMargin),
      covers = Seq("ext-bm25")),

    // ------------------------------------------------------------------
    // AUTOMATIC BM25 ROUTING (plans.Bm25AutoRoute): the IDENTICAL
    // scan-shaped plan as q_bm25, but with the corpus's inverted index
    // registered — the planner recognizes the exact BM25 function and
    // serves it from the index's pruned postings buckets instead of
    // re-tokenizing the corpus. The body REQUIRES the routed plan (no
    // corpus leaf — a silent fall-through would still pass the oracle,
    // and the point is ≤|terms| bucket reads, never the corpus), and
    // the ORACLE is the independent corpus-scan SQL: the route changes
    // where the work happens, never the answer — the same hash, planned
    // through the index.
    QueryDef(
      "q_bm25_autoroute",
      (s, dir) => {
        invertedIndexFixture(s, dir): Unit // builds + registers the index
        val terms = Seq("hash", "vector", "stream")
        val k1 = 1.2
        val b = 0.75
        val docs = t(s, dir, "documents")
        val tok = docs.select(col("doc_id"), explode(words(col("text"))).as("w"))
        val lens = tok.groupBy("doc_id").agg(count(lit(1)).as("len"))
        val avgl = lens.agg(avg(col("len")).as("avgl"))
        val n = docs.select(count(lit(1)).as("n"))
        val qtok = tok.filter(col("w").isin(terms: _*))
        val df = qtok.groupBy("w").agg(countDistinct(col("doc_id")).as("df"))
        val tf = qtok.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
        val out = tf.join(broadcast(df), "w")
          .join(lens, "doc_id")
          .crossJoin(broadcast(avgl))
          .crossJoin(broadcast(n))
          .select(
            col("doc_id"),
            round(
              log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
                (col("tf") * (k1 + 1)) /
                (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("len") / col("avgl"))),
              9).as("contrib"))
          .groupBy("doc_id")
          .agg(round(sum("contrib"), 6).as("bm25"))
        val corpusScans = out.queryExecution.optimizedPlan.collect {
          case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            lr.relation match {
              case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                h.location.rootPaths.map(_.toUri.getPath)
              case _ => Nil
            }
        }.flatten.filter(_.contains("documents.parquet"))
        require(corpusScans.isEmpty,
          s"the BM25 route must serve this plan from the index, got $corpusScans")
        out
      },
      Some("""WITH tok AS (
             |  SELECT doc_id,
             |    unnest(list_filter(string_split_regex(lower(text), '\s+'),
             |      x -> x != '')) AS w
             |  FROM documents),
             |lens AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS len FROM tok GROUP BY 1),
             |avgl AS (SELECT avg(len) AS avgl FROM lens),
             |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
             |qtok AS (SELECT doc_id, w FROM tok WHERE w IN ('hash', 'vector', 'stream')),
             |df AS (SELECT w, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM qtok GROUP BY 1),
             |tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM qtok GROUP BY 1, 2),
             |contrib AS (
             |  SELECT tf.doc_id,
             |    round(ln((n.n - df.df + 0.5) / (df.df + 0.5) + 1.0) *
             |      (tf.tf * (1.2 + 1)) /
             |      (tf.tf + 1.2 * (1 - 0.75 + 0.75 * lens.len / avgl.avgl)),
             |      9) AS c
             |  FROM tf JOIN df USING (w) JOIN lens USING (doc_id)
             |  CROSS JOIN avgl CROSS JOIN n)
             |SELECT doc_id, round(sum(c), 6) AS bm25 FROM contrib GROUP BY 1""".stripMargin),
      covers = Seq("ext-bm25-autoroute")),

    // ------------------------------------------------------------------
    // Per-document token-distribution entropy: H = −Σ p·ln p over the
    // doc's token frequencies — the standard gibberish/boilerplate signal
    // (low H = repetitive, high H = diverse). One explode + two doc-keyed
    // aggregations (Catalyst reuses the doc_id exchange); nothing global.
    QueryDef(
      "q_entropy",
      (s, dir) => {
        val tok = t(s, dir, "documents")
          .select(col("doc_id"), explode(words(col("text"))).as("w"))
        val freq = tok.groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
        val lens = freq.groupBy("doc_id")
          .agg(sum("c").as("len"))
        freq.join(lens, "doc_id")
          .select(
            col("doc_id"),
            (col("c") / col("len") * log(col("c") / col("len"))).as("pl"))
          .groupBy("doc_id")
          .agg(round(-sum("pl"), 6).as("entropy"))
      },
      Some("""WITH tok AS (
             |  SELECT doc_id,
             |    unnest(list_filter(string_split_regex(lower(text), '\s+'),
             |      x -> x != '')) AS w
             |  FROM documents),
             |freq AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c
             |         FROM tok GROUP BY 1, 2),
             |lens AS (SELECT doc_id, sum(c) AS len FROM freq GROUP BY 1)
             |SELECT f.doc_id, round(-sum(f.c / l.len * ln(f.c / l.len)), 6) AS entropy
             |FROM freq f JOIN lens l ON f.doc_id = l.doc_id
             |GROUP BY 1""".stripMargin),
      covers = Seq("ext-entropy")),

    // ------------------------------------------------------------------
    // Distribution drift between two corpus slices: per-token KL(P‖Q)
    // contributions with add-1 smoothing over the union vocabulary, top
    // 20 drivers. The "did my new crawl change the token distribution"
    // check that runs before a retrain. One token-count agg per slice
    // (both map-side combined), one full-outer merge on the vocabulary —
    // vocabulary-sized frames from there on, nothing corpus-sized moves
    // again. Per-token contribution is rounded at 9 before ranking so the
    // top-20 cut is engine-stable; ordering ties break on the token.
    QueryDef(
      "q_kl_divergence",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val isOld = substring(md5(col("doc_id").cast("string")), 1, 1) < "8"
        def counts(d: org.apache.spark.sql.DataFrame) = d
          .select(explode(words(col("text"))).as("w"))
          .groupBy("w").agg(count(lit(1)).as("c"))
        val p = counts(docs.filter(isOld)).withColumnRenamed("c", "cp")
        val q = counts(docs.filter(!isOld)).withColumnRenamed("c", "cq")
        val merged = p.join(q, Seq("w"), "full_outer")
          .select(col("w"),
            coalesce(col("cp"), lit(0L)).as("cp"),
            coalesce(col("cq"), lit(0L)).as("cq"))
        val tot = merged.agg(
          sum("cp").as("np"), sum("cq").as("nq"), count(lit(1)).as("v"))
        merged.crossJoin(broadcast(tot))
          .select(col("w"),
            ((col("cp") + 1.0) / (col("np") + col("v"))).as("pp"),
            ((col("cq") + 1.0) / (col("nq") + col("v"))).as("qq"))
          .select(col("w"), round(col("pp") * log(col("pp") / col("qq")), 9).as("kl"))
          .orderBy(col("kl").desc, col("w"))
          .limit(20)
      },
      Some("""WITH tok AS (
             |  SELECT doc_id,
             |    unnest(list_filter(string_split_regex(lower(text), '\s+'),
             |      x -> x != '')) AS w
             |  FROM documents),
             |p AS (SELECT w, CAST(count(*) AS BIGINT) cp FROM tok
             |      WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8' GROUP BY 1),
             |q AS (SELECT w, CAST(count(*) AS BIGINT) cq FROM tok
             |      WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) >= '8' GROUP BY 1),
             |merged AS (
             |  SELECT coalesce(p.w, q.w) AS w,
             |    coalesce(cp, 0) AS cp, coalesce(cq, 0) AS cq
             |  FROM p FULL OUTER JOIN q ON p.w = q.w),
             |tot AS (SELECT sum(cp) np, sum(cq) nq, CAST(count(*) AS BIGINT) v FROM merged),
             |sm AS (
             |  SELECT w, (cp + 1.0) / (np + v) AS pp, (cq + 1.0) / (nq + v) AS qq
             |  FROM merged CROSS JOIN tot)
             |SELECT w, round(pp * ln(pp / qq), 9) AS kl FROM sm
             |ORDER BY kl DESC, w LIMIT 20""".stripMargin),
      covers = Seq("ext-kl-divergence")),

    // ------------------------------------------------------------------
    // Corpus-level boilerplate REMOVAL (the CCNet / RefinedWeb pass that
    // dedup-by-document cannot do): a word 3-gram occurring in >= 3
    // DISTINCT documents is boilerplate (headers, footers, license
    // blurbs); every word covered by such a span is struck, and each doc
    // is REASSEMBLED from its surviving words in position order. Shape:
    // one posexplode of the corpus into (doc, pos, word); gram building
    // is per-row array work (no shuffle); the global gram-frequency agg
    // is the one corpus-sized shuffle (map-side partial on gram hash);
    // covered positions come from exploding each boilerplate occurrence
    // into its 3 positions — exact set semantics, never a range join;
    // reassembly sorts WITHIN each doc group (sort_array over collected
    // (pos, word) structs — bounded by doc length, not corpus).
    QueryDef(
      "q_boilerplate_strip",
      (s, dir) => {
        val toks = t(s, dir, "documents")
          .select(col("doc_id"),
            graft.functions.TextExprs.wordTokens(col("text")).as("ws"))
        val words = toks.select(col("doc_id"),
          posexplode(col("ws")).as(Seq("pos", "w")))
        // positional 3-grams via the native kernel (element i = the run
        // at token offset i): the transform(sequence)+slice+array_join
        // HOF chain this replaces is CodegenFallback — an interpreted
        // lambda per gram, measured as this query's dominant cost
        val grams = t(s, dir, "documents")
          .select(col("doc_id"), posexplode(
            graft.functions.TextExprs.wordShinglesAll(col("text"), 3))
            .as(Seq("pos", "g")))
        val boiler = grams.groupBy("g")
          .agg(count_distinct(col("doc_id")).as("nd"))
          .filter(col("nd") >= 3)
          .select("g")
        // NOT distinct'd: the anti join below only tests existence, so
        // deduplicating covered positions first would just add a full
        // shuffle of the coverage frame for nothing
        val covered = grams.join(boiler, Seq("g"))
          .select(col("doc_id"),
            explode(sequence(col("pos"), col("pos") + 2)).as("pos"))
        words.join(covered, Seq("doc_id", "pos"), "left_anti")
          .groupBy("doc_id")
          .agg(
            array_join(
              transform(
                sort_array(collect_list(struct(col("pos"), col("w")))),
                x => x("w")),
              " ").as("clean_text"),
            count(lit(1)).as("n_kept"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |    list_filter(string_split_regex(lower(text), '\s+'),
             |      x -> x != '') AS ws
             |  FROM documents),
             |words AS (
             |  SELECT doc_id, unnest(ws) AS w,
             |    unnest(range(len(ws))) AS pos
             |  FROM toks),
             |grams AS (
             |  SELECT doc_id, unnest(range(len(ws) - 2)) AS pos,
             |    unnest([ws[i + 1] || ' ' || ws[i + 2] || ' ' || ws[i + 3]
             |            for i in range(len(ws) - 2)]) AS g
             |  FROM toks WHERE len(ws) >= 3),
             |boiler AS (
             |  SELECT g FROM grams GROUP BY g
             |  HAVING count(DISTINCT doc_id) >= 3),
             |cov AS (
             |  SELECT DISTINCT gr.doc_id, gr.pos + d.d AS pos
             |  FROM grams gr JOIN boiler b USING (g),
             |    (VALUES (0), (1), (2)) d(d)),
             |kept AS (
             |  SELECT w.doc_id, w.pos, w.w
             |  FROM words w ANTI JOIN cov c
             |    ON c.doc_id = w.doc_id AND c.pos = w.pos)
             |SELECT doc_id,
             |  string_agg(w, ' ' ORDER BY pos) AS clean_text,
             |  CAST(count(*) AS BIGINT) AS n_kept
             |FROM kept GROUP BY 1""".stripMargin),
      covers = Seq("ext-boilerplate-strip")),

    // ------------------------------------------------------------------
    // PERSISTED INVERTED INDEX (operators.InvertedIndex): the same BM25
    // ranking function as q_bm25, but served off a postings index — the
    // retrieval shape a 100 TB corpus requires (a probe reads the query
    // terms' hash-bucket partitions + an O(commits) stats table, never
    // the corpus; the corpus tokenizes ONCE at maintenance time). The
    // fixture builds on the odd half and delta-appends the even half —
    // two commits, exercising the maintenance path the index exists
    // for — and the oracle is the INDEPENDENT corpus-scan SQL: the index
    // changes where the work happens, never the answer.
    QueryDef(
      "q_bm25_indexed",
      (s, dir) => {
        val idxDir = invertedIndexFixture(s, dir)
        graft.operators.InvertedIndex
          .searchBm25(s, idxDir, Seq("join", "scan", "filter"))
      },
      Some("""WITH tok AS (
             |  SELECT doc_id,
             |    unnest(list_filter(string_split_regex(lower(text), '\s+'),
             |      x -> x != '')) AS w
             |  FROM documents),
             |lens AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS len FROM tok GROUP BY 1),
             |avgl AS (SELECT avg(len) AS avgl FROM lens),
             |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
             |qtok AS (SELECT doc_id, w FROM tok WHERE w IN ('join', 'scan', 'filter')),
             |df AS (SELECT w, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM qtok GROUP BY 1),
             |tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM qtok GROUP BY 1, 2),
             |contrib AS (
             |  SELECT tf.doc_id,
             |    round(ln((n.n - df.df + 0.5) / (df.df + 0.5) + 1.0) *
             |      (tf.tf * (1.2 + 1)) /
             |      (tf.tf + 1.2 * (1 - 0.75 + 0.75 * lens.len / avgl.avgl)),
             |      9) AS c
             |  FROM tf JOIN df USING (w) JOIN lens USING (doc_id)
             |  CROSS JOIN avgl CROSS JOIN n)
             |SELECT doc_id, round(sum(c), 6) AS bm25 FROM contrib GROUP BY 1""".stripMargin),
      covers = Seq("ext-bm25-indexed")),

    // ------------------------------------------------------------------
    // BUCKET-COUNT EVOLUTION, oracle-visible: the fixture declares a new
    // term-hash bucket count on a LIVE index (one metadata write),
    // appends a second generation under it, and PARTIALLY migrates —
    // then pins the index mid-migration forever. Every run proves the
    // mixed-generation probe answers the INDEPENDENT corpus-scan BM25
    // exactly while reading ≤ one bucket per generation per term; at
    // 100 TB this is "grow the corpus 10× without rebuilding the index".
    QueryDef(
      "q_bm25_evolved",
      (s, dir) => {
        val idxDir = evolvedIndexFixture(s, dir)
        require(
          graft.operators.InvertedIndex.legacyBuckets(s, idxDir).nonEmpty,
          "the fixture must stay MID-migration: both bucket generations live")
        graft.operators.InvertedIndex
          .searchBm25(s, idxDir, Seq("join", "scan", "filter"))
      },
      Some("""WITH tok AS (
             |  SELECT doc_id,
             |    unnest(list_filter(string_split_regex(lower(text), '\s+'),
             |      x -> x != '')) AS w
             |  FROM documents),
             |lens AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS len FROM tok GROUP BY 1),
             |avgl AS (SELECT avg(len) AS avgl FROM lens),
             |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
             |qtok AS (SELECT doc_id, w FROM tok WHERE w IN ('join', 'scan', 'filter')),
             |df AS (SELECT w, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM qtok GROUP BY 1),
             |tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM qtok GROUP BY 1, 2),
             |contrib AS (
             |  SELECT tf.doc_id,
             |    round(ln((n.n - df.df + 0.5) / (df.df + 0.5) + 1.0) *
             |      (tf.tf * (1.2 + 1)) /
             |      (tf.tf + 1.2 * (1 - 0.75 + 0.75 * lens.len / avgl.avgl)),
             |      9) AS c
             |  FROM tf JOIN df USING (w) JOIN lens USING (doc_id)
             |  CROSS JOIN avgl CROSS JOIN n)
             |SELECT doc_id, round(sum(c), 6) AS bm25 FROM contrib GROUP BY 1""".stripMargin),
      covers = Seq("ext-index-bucket-evolve")),

    // ------------------------------------------------------------------
    // EXACT PHRASE SEARCH over the POSITIONAL postings: documents where
    // "table hash" occurs as consecutive tokens, with occurrence
    // counts. The probe reads the two terms' postings buckets and
    // counts adjacency by intersecting shifted position lists —
    // O(postings of the phrase terms), never a corpus re-tokenization
    // (the Lucene positional-postings bargain the OR-of-terms BM25
    // couldn't give). Oracle: an INDEPENDENT corpus-scan adjacency
    // count in SQL.
    QueryDef(
      "q_phrase_search",
      (s, dir) => {
        val idxDir = invertedIndexFixture(s, dir)
        graft.operators.InvertedIndex.searchPhrase(s, idxDir, Seq("table", "hash"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |    list_filter(string_split_regex(lower(text), '\s+'),
             |      x -> x != '') AS ws
             |  FROM documents),
             |hits AS (
             |  SELECT doc_id,
             |    unnest([CASE WHEN ws[i + 1] = 'table' AND ws[i + 2] = 'hash'
             |            THEN 1 ELSE 0 END
             |            for i in range(len(ws) - 1)]) AS m
             |  FROM toks WHERE len(ws) >= 2)
             |SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_phrase
             |FROM hits GROUP BY 1 HAVING sum(m) > 0""".stripMargin),
      covers = Seq("ext-phrase-search")),

    // ------------------------------------------------------------------
    // SQL-NATIVE TEXT RETRIEVAL (sources.GraftProcedures): the documents
    // corpus as a catalog lake table, its inverted index created and
    // registered by `CALL system.create_text_index`, the probe a
    // `CALL system.text_search` — the full lifecycle a SQL-only client
    // drives. Same independent corpus-scan oracle as q_bm25_indexed:
    // the SQL surface changes who calls, never the answer.
    QueryDef(
      "q_catalog_text_search",
      (s, dir) => {
        textCatalogFixture(s, dir)
        s.sql(
          "CALL grafttxt.system.text_search('docs', 'join,scan,filter', 100000)")
          .localCheckpoint()
      },
      Some("""WITH tok AS (
             |  SELECT doc_id,
             |    unnest(list_filter(string_split_regex(lower(text), '\s+'),
             |      x -> x != '')) AS w
             |  FROM documents),
             |lens AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS len FROM tok GROUP BY 1),
             |avgl AS (SELECT avg(len) AS avgl FROM lens),
             |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
             |qtok AS (SELECT doc_id, w FROM tok WHERE w IN ('join', 'scan', 'filter')),
             |df AS (SELECT w, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM qtok GROUP BY 1),
             |tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM qtok GROUP BY 1, 2),
             |contrib AS (
             |  SELECT tf.doc_id,
             |    round(ln((n.n - df.df + 0.5) / (df.df + 0.5) + 1.0) *
             |      (tf.tf * (1.2 + 1)) /
             |      (tf.tf + 1.2 * (1 - 0.75 + 0.75 * lens.len / avgl.avgl)),
             |      9) AS c
             |  FROM tf JOIN df USING (w) JOIN lens USING (doc_id)
             |  CROSS JOIN avgl CROSS JOIN n)
             |SELECT doc_id, round(sum(c), 6) AS bm25 FROM contrib GROUP BY 1""".stripMargin),
      covers = Seq("ext-sql-text-search")),

    // ------------------------------------------------------------------
    // PHRASE SEARCH AS A SQL TABLE FUNCTION: `FROM phrase_search(corpus,
    // phrase)` splices the positional-postings probe into the plan — a
    // SQL-only client gets exact-phrase retrieval with no CALL and no
    // Column API. The body PROVES the plan shape: every file scan in the
    // executed plan reads postings buckets, never the corpus (at 100 TB
    // that is the whole bargain — adjacency off ≤|terms| hash buckets
    // vs re-tokenizing every document). Oracle: the independent
    // corpus-scan adjacency count.
    QueryDef(
      "q_phrase_tvf",
      (s, dir) => {
        textCatalogFixture(s, dir)
        val df = s.sql(
          "SELECT doc_id, n_phrase FROM phrase_search('grafttxt.docs', 'table hash')")
        val scans = tvfScanRoots(df.queryExecution.executedPlan)
        require(scans.nonEmpty && scans.forall(_.contains("/postings")),
          s"the TVF plan must read ONLY postings buckets, scanned: $scans")
        df.localCheckpoint()
      },
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |    list_filter(string_split_regex(lower(text), '\s+'),
             |      x -> x != '') AS ws
             |  FROM documents),
             |hits AS (
             |  SELECT doc_id,
             |    unnest([CASE WHEN ws[i + 1] = 'table' AND ws[i + 2] = 'hash'
             |            THEN 1 ELSE 0 END
             |            for i in range(len(ws) - 1)]) AS m
             |  FROM toks WHERE len(ws) >= 2)
             |SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_phrase
             |FROM hits GROUP BY 1 HAVING sum(m) > 0""".stripMargin),
      covers = Seq("ext-phrase-tvf")),

    // PROXIMITY SEARCH AS A SQL TABLE FUNCTION: in-order within-window
    // chains ("table ... hash" with ≤3 tokens between) off the same
    // positional postings — proximity's first oracle row. Same plan
    // proof; oracle counts, in DuckDB, the distinct end positions of the
    // second term reachable from some first-term position within the
    // window — exactly the probe's chain fold for two terms.
    QueryDef(
      "q_near_tvf",
      (s, dir) => {
        textCatalogFixture(s, dir)
        val df = s.sql(
          "SELECT doc_id, n_near FROM near_search('grafttxt.docs', 'table hash', 3)")
        val scans = tvfScanRoots(df.queryExecution.executedPlan)
        require(scans.nonEmpty && scans.forall(_.contains("/postings")),
          s"the TVF plan must read ONLY postings buckets, scanned: $scans")
        df.localCheckpoint()
      },
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |    list_filter(string_split_regex(lower(text), '\s+'),
             |      x -> x != '') AS ws
             |  FROM documents),
             |pos AS (
             |  SELECT doc_id, unnest(ws) AS w, unnest(range(len(ws))) AS p
             |  FROM toks),
             |a AS (SELECT doc_id, p FROM pos WHERE w = 'table'),
             |b AS (SELECT doc_id, p FROM pos WHERE w = 'hash'),
             |hits AS (
             |  SELECT DISTINCT b.doc_id, b.p FROM b
             |  JOIN a ON a.doc_id = b.doc_id AND b.p > a.p AND b.p <= a.p + 3)
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_near
             |FROM hits GROUP BY 1""".stripMargin),
      covers = Seq("ext-near-tvf"))
  )

  // One-time SQL text-retrieval fixture: the corpus as a catalog lake
  // table + its registered index (built by CALL create_text_index).
  private val txtCat = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Every file-scan root in a physical plan, descending through AQE
    * wrappers (the TVF plan-shape proof needs the real scans, and before
    * execution they sit under the adaptive root).
    */
  private def tvfScanRoots(
      p: org.apache.spark.sql.execution.SparkPlan): Seq[String] =
    p.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        tvfScanRoots(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        tvfScanRoots(q.plan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.rootPaths.map(_.toString).toSeq
    }.flatten

  private def textCatalogFixture(
      s: org.apache.spark.sql.SparkSession,
      dir: String): Unit =
    txtCat.computeIfAbsent(dir, { _ =>
      val root = java.nio.file.Files.createTempDirectory("graft_txtcat").toString
      s.conf.set("spark.sql.catalog.grafttxt",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.grafttxt.root", root)
      graft.sources.VersionedLake.commit(t(s, dir, "documents"), s"$root/docs")
      s.sql("CALL grafttxt.system.create_text_index('docs', 'docs_idx', 'doc_id', 'text')")
        .collect()
      root
    }): Unit

  // ------------------------------------------------------------------
  // One-time persisted inverted-index fixture (the annFixture bargain):
  // at 100 TB the index EXISTS — built once, maintained by delta — so a
  // query that rebuilds it per run measures the build, not the probe it
  // showcases. Bench's warm-up pays the build; in-body calls memoize.
  // ------------------------------------------------------------------
  private val invIdx = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Mid-migration index fixture: generation 1 built at the default 32
    * buckets, the count re-declared to 48, generation 2 appended under
    * it, and the drain deliberately stopped after a few bucket values —
    * the steady state of a large re-bucketing, held so every run probes
    * both generations.
    */
  private def evolvedIndexFixture(
      s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    invIdxEvolved.computeIfAbsent(dir, { _ =>
      val idxDir = java.nio.file.Files.createTempDirectory("graft_invevo").toString
      val docs = t(s, dir, "documents")
      graft.operators.InvertedIndex.build(
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", idxDir): Unit
      graft.operators.InvertedIndex.setNumBuckets(s, idxDir, 48)
      graft.operators.InvertedIndex.append(
        docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", idxDir): Unit
      val left = graft.operators.InvertedIndex.migrateBuckets(s, idxDir, maxBuckets = 4)
      require(left > 0, s"fixture wants a partial drain, all migrated ($left left)")
      idxDir
    })

  private val invIdxEvolved = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def invertedIndexFixture(
      s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    invIdx.computeIfAbsent(dir, { _ =>
      val idxDir = java.nio.file.Files.createTempDirectory("graft_invidx").toString
      val docs = t(s, dir, "documents")
      graft.operators.InvertedIndex.build(
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", idxDir): Unit
      graft.operators.InvertedIndex.append(
        docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", idxDir): Unit
      // the built index makes the scan-shaped q_bm25 eligible for
      // automatic routing (plans.Bm25AutoRoute): register the parquet
      // corpus root -> index mapping. Test parquet is immutable, so the
      // registration's freshness claim holds by construction.
      graft.sources.TextIndexes.register(s"$dir/documents.parquet",
        graft.sources.TextIndexes.Entry(idxDir, "doc_id", "text", lakeCorpus = false))
      val root = new java.io.File(idxDir)
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm))
          f.delete(): Unit
        }
        rm(root)
      }))
      idxDir
    })

  /** Bench warm-up entry: pay the index builds before any query is timed. */
  def ensureInvertedIndex(s: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    invertedIndexFixture(s, dir): Unit
    textCatalogFixture(s, dir)
  }
}
