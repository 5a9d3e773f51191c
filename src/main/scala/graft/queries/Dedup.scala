package graft.queries

import graft.QueryDef
import graft.QueryDef.t
import graft.operators.{MinHash, SetSimJoin}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` / `embeddings`: exact,
  * n-gram-Jaccard, MinHash signatures (+ LSH pairing in
  * [[graft.operators.Dedup]]), SimHash, and embedding-cosine near-dup.
  *
  * The quadratic variants here are the CORRECTNESS baselines; the scale
  * path for 100 TB is MinHash-LSH banding (candidate generation is a
  * shuffle on band-hash, linear in data + candidate pairs) — see
  * graft.operators.Dedup and its spec.
  */
object Dedup {

  /** DuckDB-side shingling, mirroring graft.functions.WordShingles. */
  private[queries] val ShinglesSql =
    """SELECT doc_id, unnest(list_distinct(
      |    [ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))])) AS s
      |  FROM (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
      |          x -> x != '') AS ws
      |        FROM documents)
      |  WHERE len(ws) >= 2""".stripMargin

  /** DuckDB replay of [[graft.operators.SpanDedup]]'s island detection at
    * n=5: positional 5-gram 60-bit hashes, keep-first ownership via a
    * window min over the hash, gaps-and-islands merge of hit offsets.
    * Shared CTE prefix of the two span-dedup oracles; ends at `isl`
    * (doc_id, pos, island).
    */
  private[queries] val SpanIslandsSql =
    """toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
      |           x -> x != '') AS ws
      |  FROM documents),
      |grams AS (
      |  SELECT doc_id, unnest([{'pos': i,
      |      'h': CAST(concat('0x', substr(md5(array_to_string(ws[i:i+4], ' ')), 1, 15)) AS BIGINT)}
      |    for i in range(1, len(ws) - 3)]) AS u
      |  FROM toks),
      |g AS (SELECT doc_id, u.pos AS pos, u.h AS h FROM grams),
      |hits AS (
      |  SELECT doc_id, pos FROM (
      |    SELECT doc_id, pos, min(doc_id) OVER (PARTITION BY h) AS first_id FROM g)
      |  WHERE doc_id > first_id),
      |flg AS (
      |  SELECT doc_id, pos,
      |    CASE WHEN lag(pos) OVER w IS NULL OR pos > lag(pos) OVER w + 5
      |         THEN 1 ELSE 0 END AS f
      |  FROM hits WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
      |isl AS (
      |  SELECT doc_id, pos,
      |    sum(f) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island
      |  FROM flg)""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    // Exact dedup: hash-groupBy on content digest; canonical id = min id.
    // One shuffle on the digest; at 100 TB pre-aggregation makes the
    // shuffle carry one row per distinct digest per partition.
    QueryDef(
      "q_dedup_exact",
      (s, dir) =>
        t(s, dir, "documents")
          .groupBy(md5(col("text").cast("binary")).as("h"))
          .agg(min("doc_id").as("canonical_id"), count(lit(1)).as("n_copies")),
      Some("""SELECT md5(text) AS h, min(doc_id) AS canonical_id,
             |  CAST(count(*) AS BIGINT) AS n_copies
             |FROM documents GROUP BY 1""".stripMargin),
      covers = Seq("ext-dedup-exact")),

    // ------------------------------------------------------------------
    // n-gram Jaccard near-dup pairs, EXACT but prefix-filtered (PPJoin —
    // see graft.operators.SetSimJoin): word-2-gram shingle sets hashed to
    // 64-bit, candidates only from each set's rare-token prefix, exact
    // array-intersect verification. The oracle keeps the quadratic
    // formulation — identical output, wildly different plan. The planted
    // near-dup pairs in the test data sit at J >= 0.9; background noise
    // tops out ~0.13, so 0.5 separates cleanly.
    QueryDef(
      "q_dedup_ngram_jaccard",
      (s, dir) => {
        val tok = t(s, dir, "documents")
          .select(
            col("doc_id"),
            explode(graft.functions.TextExprs.wordShingles(col("text"), 2)).as("s"))
          .select(col("doc_id"), xxhash64(col("s")).as("h"))
        SetSimJoin.jaccardSelfJoin(tok, "doc_id", "h", 0.5)
          .select(
            col("id_a"),
            col("id_b"),
            // single int→double division: bit-exact across engines, no round
            (col("inter") * lit(1.0) / (col("na") + col("nb") - col("inter")))
              .as("jaccard"))
          .filter(col("jaccard") >= 0.5)
      },
      Some(s"""WITH sh AS (
              |  $ShinglesSql
              |), sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) n FROM sh GROUP BY 1),
              |pairs AS (
              |  SELECT a.doc_id id_a, b.doc_id id_b, CAST(count(*) AS BIGINT) inter
              |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              |  GROUP BY 1, 2)
              |SELECT id_a, id_b,
              |  inter * 1.0 / (na.n + nb.n - inter) AS jaccard
              |FROM pairs
              |JOIN sizes na ON id_a = na.doc_id
              |JOIN sizes nb ON id_b = nb.doc_id
              |WHERE inter * 1.0 / (na.n + nb.n - inter) >= 0.5""".stripMargin),
      covers = Seq("ext-dedup-ngram")),

    // ------------------------------------------------------------------
    // MinHash signatures: k=16 permutations h_i(x) = (a_i*x + b_i) mod P
    // over md5-derived 60-bit shingle hashes. The signature itself is the
    // verifiable artifact; LSH banding over it (graft.operators.Dedup)
    // produces candidate pairs without the quadratic join.
    QueryDef(
      "q_dedup_minhash",
      (s, dir) => {
        val sh = MinHash.shingleRows(t(s, dir, "documents"), "doc_id", "text")
        val hashed = sh.withColumn("h", MinHash.shingleHash(col("s")))
        hashed
          .groupBy("doc_id")
          .agg(
            MinHash.minhashCol(col("h"), 0),
            MinHash.minhashCols(col("h"), 1 until MinHash.K): _*)
      },
      Some(MinHash.signatureOracle),
      covers = Seq("ext-dedup-minhash")),

    // ------------------------------------------------------------------
    // LEAKAGE-SAFE train/test split: the md5 split key is the dup-group
    // CANONICAL, not the document — near-identical documents land in the
    // SAME split, so the test set can never score memorized training
    // near-dups (the classic contamination failure of per-doc splits,
    // which q_train_test_split's per-row hash would commit on a
    // deduplicated-by-group corpus). Groups here are full-MinHash-
    // signature identity (Jaccard ~= 1 sets, one window pass — at 100 TB
    // one shuffle on the 16-int signature key, no pair join, no
    // iteration); for TRANSITIVE near-dup closure key the same split on
    // q_dedup_components' canonical instead — same shape, CC cost.
    QueryDef(
      "q_split_leakage_safe",
      (s, dir) => {
        val sh = MinHash.shingleRows(t(s, dir, "documents"), "doc_id", "text")
        val hashed = sh.withColumn("h", MinHash.shingleHash(col("s")))
        val sigs = hashed
          .groupBy("doc_id")
          .agg(
            MinHash.minhashCol(col("h"), 0),
            MinHash.minhashCols(col("h"), 1 until MinHash.K): _*)
        val sigCols = (0 until MinHash.K).map(i => col(s"m$i"))
        sigs
          .withColumn("canonical_id",
            min(col("doc_id")).over(Window.partitionBy(sigCols: _*)))
          .select(
            col("doc_id"),
            col("canonical_id"),
            when(substring(md5(col("canonical_id").cast("string")), 1, 1) < "c",
              lit("train")).otherwise(lit("test")).as("split"))
      },
      Some {
        val sigCols = (0 until MinHash.K).map(i => s"m$i").mkString(", ")
        s"""WITH sigs AS (
           |${MinHash.signatureOracle}
           |),
           |canon AS (
           |  SELECT doc_id,
           |         min(doc_id) OVER (PARTITION BY $sigCols) AS canonical_id
           |  FROM sigs)
           |SELECT doc_id, canonical_id,
           |  CASE WHEN substr(md5(CAST(canonical_id AS VARCHAR)), 1, 1) < 'c'
           |       THEN 'train' ELSE 'test' END AS split
           |FROM canon""".stripMargin
      },
      covers = Seq("ext-split-leakage-safe")),

    // ------------------------------------------------------------------
    // SimHash (16-bit): per distinct word, a 60-bit md5 hash votes +1/-1 on
    // each of 16 bit positions; the sign vector packs into one integer.
    // Near-dups differ in few bits (hamming distance on the signature).
    QueryDef(
      "q_dedup_simhash",
      (s, dir) => {
        val tok = t(s, dir, "documents")
          .select(
            col("doc_id"),
            explode(graft.functions.TextExprs.wordShingles(col("text"), 1)).as("w"))
          .withColumn("h", MinHash.shingleHash(col("w")))
        tok
          .groupBy("doc_id")
          .agg(SimHash.signatureAgg(col("h")).as("simhash"))
      },
      Some(SimHash.oracle),
      covers = Seq("ext-dedup-simhash")),

    // ------------------------------------------------------------------
    // SimHash PAIRING: near-identical pairs by hamming distance ≤ 1 on
    // 48-bit signatures (16 bits saturates on a topically-uniform
    // corpus — measured 7k distance-0 pairs at sf0.01; 48 bits spreads
    // random pairs to ~24). The scale path is the pigeonhole block
    // join: split the signature into 4×12-bit blocks — distance ≤ 1
    // leaves at least 3 blocks EQUAL — so candidates come from a
    // shuffle on (block, value), linear in corpus + collisions, and
    // only candidates pay the popcount verify. The oracle keeps the
    // quadratic xor/bit_count formulation (identical output, viable
    // only at oracle scale).
    QueryDef(
      "q_simhash_pairs",
      (s, dir) => {
        val bits = 48
        val tok = t(s, dir, "documents")
          .select(
            col("doc_id"),
            explode(graft.functions.TextExprs.wordShingles(col("text"), 1)).as("w"))
          .withColumn("h", MinHash.shingleHash(col("w")))
        val sig = tok
          .groupBy("doc_id")
          .agg(SimHash.signatureAgg(col("h"), bits).as("sig"))
        val blocks = sig.select(
          col("doc_id"), col("sig"),
          explode(array((0 until 4).map(b =>
            struct(lit(b).as("blk"),
              shiftright(col("sig"), b * 12).bitwiseAND(lit(4095L)).as("nib"))): _*)).as("bk"))
          .select(col("doc_id"), col("sig"), col("bk.blk").as("blk"), col("bk.nib").as("nib"))
        blocks.as("a")
          .join(
            blocks.as("b"),
            col("a.blk") === col("b.blk") && col("a.nib") === col("b.nib") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(
            col("a.doc_id").as("id_a"),
            col("b.doc_id").as("id_b"),
            bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
          .filter(col("hamming") <= 1)
          .distinct()
      },
      Some(s"""WITH sigs AS (
              |${SimHash.oracleFor(48, "sig")}
              |)
              |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              |  CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
              |FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
              |WHERE bit_count(xor(a.sig, b.sig)) <= 1""".stripMargin),
      covers = Seq("ext-simhash-pairs")),

    // ------------------------------------------------------------------
    // Embedding-cosine near-dup pairs, label-blocked (realistic blocking
    // key keeps the pair space linear-ish; the unblocked scale path is the
    // random-projection LSH in graft.operators.Similarity).
    QueryDef(
      "q_dedup_embed_cosine",
      (s, dir) => {
        import graft.functions.VectorExprs.dotProduct
        // cast + native dot_product keep the pair loop whole-stage
        // codegen'd; the HOF formulation (zip_with/aggregate lambdas) is
        // interpreted per element per pair.
        val e = t(s, dir, "embeddings")
          .select(
            col("vec_id"),
            col("label"),
            col("embedding").cast("array<double>").as("v"))
          .withColumn("norm", sqrt(dotProduct(col("v"), col("v"))))
        e.as("a")
          .join(e.as("b"), col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
          .select(
            col("a.vec_id").as("id_a"),
            col("b.vec_id").as("id_b"),
            round(
              dotProduct(col("a.v"), col("b.v")) / (col("a.norm") * col("b.norm")),
              3).as("cos"))
          .filter(col("cos") >= 0.4)
      },
      Some("""WITH e AS (
             |  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
             |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             |  round(list_dot_product(a.v, b.v) /
             |    (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 3) AS cos
             |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
             |WHERE round(list_dot_product(a.v, b.v) /
             |    (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 3) >= 0.4""".stripMargin),
      covers = Seq("ext-dedup-embed")),

    // ------------------------------------------------------------------
    // LSH banding candidates, oracle-checked end to end: both engines
    // compute the SAME 16-component MinHash signatures, then pair docs
    // agreeing on any 4-component band. Spark shuffles on (band, key) —
    // linear in corpus + pairs; the oracle keeps the quadratic self-join
    // (exact same output, a plan only viable at oracle scale).
    QueryDef(
      "q_dedup_lsh_pairs",
      (s, dir) => {
        val sig = MinHash.signatures(t(s, dir, "documents"), "doc_id", "text")
        MinHash.lshCandidatePairs(sig, "doc_id", rowsPerBand = 4)
      },
      Some {
        val bandEq = (0 until MinHash.K / 4)
          .map { bnd =>
            (0 until 4)
              .map(r => s"a.m${bnd * 4 + r} = b.m${bnd * 4 + r}")
              .mkString("(", " AND ", ")")
          }
          .mkString("\n     OR ")
        s"""WITH sigs AS (
           |${MinHash.signatureOracle}
           |)
           |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
           |FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
           |WHERE $bandEq""".stripMargin
      },
      covers = Seq("ext-dedup-lsh-pairs")),

    // ------------------------------------------------------------------
    // CROSS-CORPUS near-dup join — the production admission shape: an
    // incoming crawl batch (md5-keyed 50% of docs standing in for the
    // fresh crawl) deduped against the standing curated corpus (the
    // other 50%). LSH bands on both sides join on (band, key) — linear
    // in corpus + collisions — then exact shingle Jaccard verifies the
    // candidates. The oracle replays the identical band agreement with
    // the quadratic cross join and the identical single-division
    // Jaccard, so the hash match covers recall AND verification.
    QueryDef(
      "q_dedup_cross_corpus",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val splitKey = substring(md5(col("doc_id").cast("string")), 1, 1)
        MinHash
          .crossCorpusDuplicates(
            docs.filter(splitKey < "8"),
            docs.filter(splitKey >= "8"),
            "doc_id",
            "text",
            threshold = 0.3)
          .select(col("inc_id"), col("base_id"), round(col("jaccard"), 3).as("jaccard"))
      },
      Some {
        val bandEq = (0 until MinHash.K / 4)
          .map { bnd =>
            (0 until 4)
              .map(r => s"a.m${bnd * 4 + r} = b.m${bnd * 4 + r}")
              .mkString("(", " AND ", ")")
          }
          .mkString("\n     OR ")
        s"""WITH sigs AS (
           |${MinHash.signatureOracle}
           |), sh AS (
           |$ShinglesSql
           |),
           |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY 1),
           |cand AS (
           |  SELECT DISTINCT a.doc_id AS inc_id, b.doc_id AS base_id
           |  FROM sigs a JOIN sigs b
           |    ON substr(md5(CAST(a.doc_id AS VARCHAR)), 1, 1) >= '8'
           |   AND substr(md5(CAST(b.doc_id AS VARCHAR)), 1, 1) < '8'
           |   AND ($bandEq)),
           |inter AS (
           |  SELECT c.inc_id, c.base_id, CAST(count(*) AS BIGINT) AS i
           |  FROM cand c
           |  JOIN sh si ON si.doc_id = c.inc_id
           |  JOIN sh sb ON sb.doc_id = c.base_id AND sb.s = si.s
           |  GROUP BY 1, 2)
           |SELECT t.inc_id, t.base_id,
           |  round(t.i * 1.0 / (za.n + zb.n - t.i), 3) AS jaccard
           |FROM inter t
           |JOIN sz za ON za.doc_id = t.inc_id
           |JOIN sz zb ON zb.doc_id = t.base_id
           |WHERE t.i * 1.0 / (za.n + zb.n - t.i) >= 0.3""".stripMargin
      },
      covers = Seq("ext-dedup-cross-corpus")),

    // ------------------------------------------------------------------
    // Near-dup CLUSTERING: pairs → components → canonical id per document
    // (operators.ConnectedComponents, alternating large-star/small-star —
    // O(log n) keyed-shuffle rounds, no collect_set, the 100 TB-safe
    // formulation). The oracle computes the identical transitive closure
    // with a recursive CTE — viable only at oracle scale.
    QueryDef(
      "q_dedup_components",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val tok = docs
          .select(
            col("doc_id"),
            explode(graft.functions.TextExprs.wordShingles(col("text"), 2)).as("s"))
          .select(col("doc_id"), xxhash64(col("s")).as("h"))
        val pairs = SetSimJoin.jaccardSelfJoin(tok, "doc_id", "h", 0.5)
          .filter(
            col("inter") * lit(1.0) / (col("na") + col("nb") - col("inter")) >= 0.5)
          .select(col("id_a"), col("id_b"))
        graft.operators.ConnectedComponents
          .withVertices(docs.select("doc_id"), "doc_id", pairs)
          .select(col("doc_id"), col("component").as("canonical_id"))
      },
      Some(s"""WITH RECURSIVE sh AS (
              |  $ShinglesSql
              |), sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) n FROM sh GROUP BY 1),
              |pairs AS (
              |  SELECT a.doc_id id_a, b.doc_id id_b, CAST(count(*) AS BIGINT) inter
              |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              |  GROUP BY 1, 2),
              |edges AS (
              |  SELECT id_a AS u, id_b AS v FROM pairs
              |  JOIN sizes na ON id_a = na.doc_id
              |  JOIN sizes nb ON id_b = nb.doc_id
              |  WHERE inter * 1.0 / (na.n + nb.n - inter) >= 0.5),
              |sym AS (SELECT u, v FROM edges UNION SELECT v, u FROM edges),
              |reach(id, r) AS (
              |  SELECT doc_id, doc_id FROM documents
              |  UNION
              |  SELECT s.v, reach.r FROM sym s JOIN reach ON s.u = reach.id)
              |SELECT id AS doc_id, min(r) AS canonical_id
              |FROM reach GROUP BY 1""".stripMargin),
      covers = Seq("ext-dedup-components")),

    // ------------------------------------------------------------------
    // Benchmark DECONTAMINATION: for every corpus document, the fraction
    // of its word-2-gram shingles that collide with a held-out benchmark
    // set (here: a deterministic md5-keyed 25% of docs standing in for an
    // eval suite). The real-world shape at 100 TB: the benchmark shingle
    // set is tiny (MBs even for a full eval harness) → broadcast it and
    // the whole pass is one corpus scan + hash-probe per shingle, no
    // shuffle on the 100 TB side except the per-doc count agg.
    QueryDef(
      "q_decontaminate",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val isBench =
          substring(md5(col("doc_id").cast("string")), 1, 1) < "4"
        def shingles(d: org.apache.spark.sql.DataFrame) =
          d.select(
            col("doc_id"),
            explode(graft.functions.TextExprs.wordShingles(col("text"), 2)).as("s"))
        val benchSet = shingles(docs.filter(isBench)).select("s").distinct()
        shingles(docs.filter(!isBench))
          .join(broadcast(benchSet.withColumn("hit", lit(1))), Seq("s"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_shingles"), count(col("hit")).as("n_hit"))
          // single int→double division: bit-exact across engines, no round
          .withColumn("contam", col("n_hit") * lit(1.0) / col("n_shingles"))
      },
      Some(s"""WITH sh AS (
              |  $ShinglesSql
              |),
              |bench AS (SELECT DISTINCT s FROM sh
              |          WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '4'),
              |corpus AS (SELECT doc_id, s FROM sh
              |           WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) >= '4')
              |SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
              |  CAST(count(b.s) AS BIGINT) AS n_hit,
              |  count(b.s) * 1.0 / count(*) AS contam
              |FROM corpus c LEFT JOIN bench b ON c.s = b.s
              |GROUP BY 1""".stripMargin),
      covers = Seq("ext-decontaminate")),

    // ------------------------------------------------------------------
    // EXACT-SUBSTRING decontamination: verbatim benchmark runs at ANY
    // token offset. The shingle-overlap face above scores a FRACTION, so
    // a short eval span pasted into a long document dilutes below any
    // threshold (DecontaminateSpec constructs the miss); this face hashes
    // every benchmark 8-token run, broadcasts the set, and probes every
    // POSITIONAL corpus 8-gram — one corpus scan, per-doc agg, and a hit
    // means 8 consecutive tokens match verbatim, with the offset
    // reported. 100 TB shape: the probe side is the broadcast (eval
    // suites are MBs); at larger bench sets send xxhash64(g) instead of
    // the strings — same join, 8 bytes per gram.
    QueryDef(
      "q_decontaminate_exact",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val isBench =
          substring(md5(col("doc_id").cast("string")), 1, 1) < "4"
        val bench = docs.filter(isBench)
          .select(explode(
            graft.functions.TextExprs.wordShingles(col("text"), 8)).as("g"))
          .distinct()
        val corpus = docs.filter(!isBench)
          .select(col("doc_id"), posexplode(
            graft.functions.TextExprs.wordShinglesAll(col("text"), 8))
            .as(Seq("pos", "g")))
        corpus
          .join(broadcast(bench.withColumn("hit", lit(1))), Seq("g"), "left")
          .groupBy("doc_id")
          .agg(
            count(lit(1)).as("n_grams"),
            count(col("hit")).as("n_exact_hits"),
            min(when(col("hit").isNotNull, (col("pos") + 1).cast("long")))
              .as("first_hit_pos"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
             |           x -> x != '') AS ws
             |  FROM documents),
             |grams AS (
             |  SELECT doc_id,
             |    unnest([{'pos': i, 'g': array_to_string(ws[i:i+7], ' ')}
             |            for i in range(1, len(ws) - 6)]) AS u
             |  FROM toks),
             |bench AS (SELECT DISTINCT u.g AS g FROM grams
             |          WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '4'),
             |corpus AS (SELECT doc_id, u.pos AS pos, u.g AS g FROM grams
             |           WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) >= '4')
             |SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
             |  CAST(count(b.g) AS BIGINT) AS n_exact_hits,
             |  min(CASE WHEN b.g IS NOT NULL THEN c.pos END) AS first_hit_pos
             |FROM corpus c LEFT JOIN bench b ON c.g = b.g
             |GROUP BY 1""".stripMargin),
      covers = Seq("ext-decontaminate-exact")),

    // ------------------------------------------------------------------
    // REPEATED-SUBSTRING spans (span-level dedup, not doc-level): every
    // maximal run of tokens that also appears verbatim in a LOWER-id
    // document, as (doc, span_start, span_end) token intervals — the
    // "dedup training data" curation pass that strips repeated passages
    // (boilerplate, quoted reposts) while keeping one canonical copy.
    // Three shuffles total at any scale: gram-hash (first-owner window
    // min), doc (island merge), and the co-partitioned span agg — see
    // graft.operators.SpanDedup. The oracle replays the identical island
    // construction over the identical 60-bit gram hashes.
    QueryDef(
      "q_repeated_spans",
      (s, dir) =>
        graft.operators.SpanDedup
          .repeatedSpans(t(s, dir, "documents"), "doc_id", "text", n = 5),
      Some(s"""WITH $SpanIslandsSql
              |SELECT doc_id,
              |  CAST(min(pos) AS BIGINT) AS span_start,
              |  CAST(max(pos) + 4 AS BIGINT) AS span_end,
              |  CAST(count(*) AS BIGINT) AS n_dup_grams,
              |  CAST(max(pos) + 4 - min(pos) + 1 AS BIGINT) AS span_toks
              |FROM isl GROUP BY doc_id, island""".stripMargin),
      covers = Seq("ext-dedup-substring-spans")),

    // ------------------------------------------------------------------
    // The REMOVAL face of span dedup: per document, how many tokens sat
    // inside a repeated span and the md5 of the text with those spans
    // stripped (keep-first: minimum-id owners are untouched, so every
    // passage survives exactly once corpus-wide). Digest output keeps
    // rows O(1); the digest proves the rebuilt cleaned text itself.
    QueryDef(
      "q_substring_dedup",
      (s, dir) =>
        graft.operators.SpanDedup
          .cleanedCorpus(t(s, dir, "documents"), "doc_id", "text", n = 5),
      Some(s"""WITH $SpanIslandsSql,
              |spans AS (
              |  SELECT doc_id, min(pos) AS s, max(pos) + 4 AS e
              |  FROM isl GROUP BY doc_id, island),
              |cov AS (SELECT doc_id, unnest(range(s, e + 1)) AS pos FROM spans),
              |words AS (
              |  SELECT doc_id, unnest([{'pos': i, 'w': ws[i]}
              |    for i in range(1, len(ws) + 1)]) AS u
              |  FROM toks),
              |w2 AS (SELECT doc_id, u.pos AS pos, u.w AS w FROM words)
              |SELECT w.doc_id,
              |  CAST(count(*) AS BIGINT) AS n_toks,
              |  CAST(count(c.pos) AS BIGINT) AS dup_toks,
              |  count(c.pos) * 1.0 / count(*) AS dup_frac,
              |  md5(coalesce(string_agg(CASE WHEN c.pos IS NULL THEN w.w END,
              |        ' ' ORDER BY w.pos), '')) AS clean_digest
              |FROM w2 w LEFT JOIN cov c ON w.doc_id = c.doc_id AND w.pos = c.pos
              |GROUP BY 1""".stripMargin),
      covers = Seq("ext-dedup-substring-clean")),

    // ------------------------------------------------------------------
    // INCREMENTAL span dedup: an ingest batch (doc_id >= 250, standing
    // corpus = the rest — ids are ingest-ordered, matching the operator
    // contract) probes the persisted gram-owner index; only the delta is
    // gram-exploded, so per-batch cost is O(delta grams + hits) — the
    // span analogue of q_dedup_incremental. Output ≡ the full-corpus
    // q_repeated_spans restricted to delta docs (hits are per-doc
    // independent, so restricting before or after island-merge is
    // identical — which is exactly what the oracle does).
    QueryDef(
      "q_spans_incremental",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val index = graft.operators.SpanDedup
          .ownerIndex(docs.filter(col("doc_id") < 250), "doc_id", "text", n = 5)
        graft.operators.SpanDedup.incrementalSpans(
          index, docs.filter(col("doc_id") >= 250), "doc_id", "text", n = 5)
      },
      Some(s"""WITH $SpanIslandsSql
              |SELECT doc_id,
              |  CAST(min(pos) AS BIGINT) AS span_start,
              |  CAST(max(pos) + 4 AS BIGINT) AS span_end,
              |  CAST(count(*) AS BIGINT) AS n_dup_grams,
              |  CAST(max(pos) + 4 - min(pos) + 1 AS BIGINT) AS span_toks
              |FROM isl WHERE doc_id >= 250 GROUP BY doc_id, island""".stripMargin),
      covers = Seq("ext-dedup-substring-incremental")),

    // ------------------------------------------------------------------
    // Decontamination SCRUB: instead of reporting contamination
    // (q_decontaminate_exact) or dropping whole documents, surgically
    // REMOVE the verbatim benchmark spans — positional 8-gram hits
    // against the broadcast benchmark set, merged into maximal spans,
    // stripped via the shared clean-accounting stage. What a production
    // pipeline actually ships: the document survives, the leaked eval
    // data doesn't. One corpus scan + per-doc windows; the benchmark
    // side stays broadcast-sized.
    QueryDef(
      "q_decontaminate_scrub",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val isBench =
          substring(md5(col("doc_id").cast("string")), 1, 1) < "4"
        val bench = docs.filter(isBench)
          .select(explode(
            graft.functions.TextExprs.wordShingles(col("text"), 8)).as("g"))
          .distinct()
        val corpus = docs.filter(!isBench)
        val hits = corpus
          .select(col("doc_id"), posexplode(
            graft.functions.TextExprs.wordShinglesAll(col("text"), 8))
            .as(Seq("pos0", "g")))
          .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("g"))
          .join(broadcast(bench), Seq("g"))
          .select(col("doc_id"), col("pos"))
        val spans = graft.operators.SpanDedup.mergeSpans(hits, "doc_id", n = 8)
        graft.operators.SpanDedup.cleanAccounting(corpus, "doc_id", "text", spans)
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
             |           x -> x != '') AS ws
             |  FROM documents),
             |grams AS (
             |  SELECT doc_id,
             |    unnest([{'pos': i, 'g': array_to_string(ws[i:i+7], ' ')}
             |            for i in range(1, len(ws) - 6)]) AS u
             |  FROM toks),
             |bench AS (SELECT DISTINCT u.g AS g FROM grams
             |          WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '4'),
             |hits AS (
             |  SELECT c.doc_id, c.u.pos AS pos
             |  FROM grams c JOIN bench b ON c.u.g = b.g
             |  WHERE substr(md5(CAST(c.doc_id AS VARCHAR)), 1, 1) >= '4'),
             |flg AS (
             |  SELECT doc_id, pos,
             |    CASE WHEN lag(pos) OVER w IS NULL OR pos > lag(pos) OVER w + 8
             |         THEN 1 ELSE 0 END AS f
             |  FROM hits WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
             |isl AS (
             |  SELECT doc_id, pos,
             |    sum(f) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island
             |  FROM flg),
             |spans AS (
             |  SELECT doc_id, min(pos) AS s, max(pos) + 7 AS e
             |  FROM isl GROUP BY doc_id, island),
             |cov AS (SELECT doc_id, unnest(range(s, e + 1)) AS pos FROM spans),
             |words AS (
             |  SELECT doc_id, unnest([{'pos': i, 'w': ws[i]}
             |    for i in range(1, len(ws) + 1)]) AS u
             |  FROM toks
             |  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) >= '4'),
             |w2 AS (SELECT doc_id, u.pos AS pos, u.w AS w FROM words)
             |SELECT w.doc_id,
             |  CAST(count(*) AS BIGINT) AS n_toks,
             |  CAST(count(c.pos) AS BIGINT) AS dup_toks,
             |  count(c.pos) * 1.0 / count(*) AS dup_frac,
             |  md5(coalesce(string_agg(CASE WHEN c.pos IS NULL THEN w.w END,
             |        ' ' ORDER BY w.pos), '')) AS clean_digest
             |FROM w2 w LEFT JOIN cov c ON w.doc_id = c.doc_id AND w.pos = c.pos
             |GROUP BY 1""".stripMargin),
      covers = Seq("ext-decontaminate-scrub")),

    // ------------------------------------------------------------------
    // END-TO-END near-dup dedup, the full production pipeline in one
    // query: MinHash signatures → LSH banding candidates → exact-Jaccard
    // verification (MinHash.nearDuplicates — only candidate pairs are
    // verified, never all pairs) → connected components → keep the
    // minimum doc per cluster. Output: one row per SURVIVING document
    // with the cluster size it absorbed. Every stage is the 100 TB
    // formulation: banding shuffles on (band, key), verify touches only
    // candidates, CC is O(log n) keyed-shuffle rounds. The oracle replays
    // the identical pipeline (band equality on the same signatures, the
    // quadratic candidate join being viable only at oracle scale).
    QueryDef(
      "q_dedup_keep_rep",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val edges = MinHash.nearDuplicates(docs, "doc_id", "text", 0.5)
          .select(col("id_a"), col("id_b"))
        graft.operators.ConnectedComponents
          .withVertices(docs.select("doc_id"), "doc_id", edges)
          .groupBy(col("component").as("doc_id"))
          .agg(count(lit(1)).as("n_in_cluster"))
      },
      Some {
        val bandEq = (0 until MinHash.K / 4)
          .map { bnd =>
            (0 until 4)
              .map(r => s"a.m${bnd * 4 + r} = b.m${bnd * 4 + r}")
              .mkString("(", " AND ", ")")
          }
          .mkString("\n     OR ")
        s"""WITH RECURSIVE sigs AS (
           |${MinHash.signatureOracle}
           |),
           |cand AS (
           |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
           |  WHERE $bandEq),
           |shc AS (
           |  $ShinglesSql
           |), sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) n FROM shc GROUP BY 1),
           |inter AS (
           |  SELECT c.id_a, c.id_b, CAST(count(*) AS BIGINT) AS i
           |  FROM cand c
           |  JOIN shc sa ON sa.doc_id = c.id_a
           |  JOIN shc sb ON sb.doc_id = c.id_b AND sb.s = sa.s
           |  GROUP BY 1, 2),
           |edges AS (
           |  SELECT id_a AS u, id_b AS v FROM inter
           |  JOIN sizes na ON id_a = na.doc_id
           |  JOIN sizes nb ON id_b = nb.doc_id
           |  WHERE i * 1.0 / (na.n + nb.n - i) >= 0.5),
           |sym AS (SELECT u, v FROM edges UNION SELECT v, u FROM edges),
           |reach(id, r) AS (
           |  SELECT doc_id, doc_id FROM documents
           |  UNION
           |  SELECT s.v, reach.r FROM sym s JOIN reach ON s.u = reach.id),
           |comp AS (SELECT id, min(r) AS canon FROM reach GROUP BY 1)
           |SELECT canon AS doc_id, CAST(count(*) AS BIGINT) AS n_in_cluster
           |FROM comp GROUP BY 1""".stripMargin
      },
      covers = Seq("ext-dedup-pipeline")),

    // ------------------------------------------------------------------
    // INCREMENTAL ingest dedup: candidate pairs for a new batch against
    // the standing LSH inverted index — only the DELTA is band-exploded
    // and joined (new×existing + new×new); existing×existing pairs were
    // emitted when those docs arrived. Per-batch cost O(delta + matches)
    // instead of re-running corpus-wide dedup per ingest — the shape
    // that keeps continuous dedup affordable at TBs/day. "New" here is a
    // deterministic md5 quarter of the corpus standing in for a batch.
    QueryDef(
      "q_dedup_incremental",
      (s, dir) => {
        val sig = MinHash.signatures(t(s, dir, "documents"), "doc_id", "text")
        val isNew =
          substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1) < "4"
        MinHash.incrementalLshPairs(
          MinHash.bandRows(sig, "doc_id"), sig.filter(isNew), "doc_id")
      },
      Some {
        val bandEq = (0 until MinHash.K / 4)
          .map { bnd =>
            (0 until 4)
              .map(r => s"a.m${bnd * 4 + r} = b.m${bnd * 4 + r}")
              .mkString("(", " AND ", ")")
          }
          .mkString("\n     OR ")
        s"""WITH sigs AS (
           |${MinHash.signatureOracle}
           |)
           |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
           |FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
           |WHERE ($bandEq)
           |  AND (substr(md5(CAST(a.doc_id AS VARCHAR)), 1, 1) < '4'
           |    OR substr(md5(CAST(b.doc_id AS VARCHAR)), 1, 1) < '4')""".stripMargin
      },
      covers = Seq("ext-dedup-incremental")),

    // ------------------------------------------------------------------
    // Near-dup clustering with QUALITY-ranKED representative selection —
    // production dedup keeps the BEST document per cluster (longest,
    // highest quality score), not the smallest id: pairs → connected
    // components → argmax(n_chars, tie: min doc_id) per component via
    // max(struct) — one extra keyed agg + broadcast-join over the
    // components frame, no window over the corpus. Output maps every
    // document to its surviving representative.
    QueryDef(
      "q_dedup_keep_best",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val tok = docs
          .select(
            col("doc_id"),
            explode(graft.functions.TextExprs.wordShingles(col("text"), 2)).as("s"))
          .select(col("doc_id"), xxhash64(col("s")).as("h"))
        val pairs = SetSimJoin.jaccardSelfJoin(tok, "doc_id", "h", 0.5)
          .filter(
            col("inter") * lit(1.0) / (col("na") + col("nb") - col("inter")) >= 0.5)
          .select(col("id_a"), col("id_b"))
        val comp = graft.operators.ConnectedComponents
          .withVertices(docs.select("doc_id"), "doc_id", pairs)
        val reps = comp
          .join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
          .groupBy("component")
          .agg(max(struct(col("n_chars"), (-col("doc_id")).as("neg"))).as("m"))
          .select(col("component"), (-col("m.neg")).as("rep_id"))
        comp.join(reps, "component").select(col("doc_id"), col("rep_id"))
      },
      Some(s"""WITH RECURSIVE sh AS (
              |  $ShinglesSql
              |), sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) n FROM sh GROUP BY 1),
              |pairs AS (
              |  SELECT a.doc_id id_a, b.doc_id id_b, CAST(count(*) AS BIGINT) inter
              |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              |  GROUP BY 1, 2),
              |edges AS (
              |  SELECT id_a AS u, id_b AS v FROM pairs
              |  JOIN sizes na ON id_a = na.doc_id
              |  JOIN sizes nb ON id_b = nb.doc_id
              |  WHERE inter * 1.0 / (na.n + nb.n - inter) >= 0.5),
              |sym AS (SELECT u, v FROM edges UNION SELECT v, u FROM edges),
              |reach(id, r) AS (
              |  SELECT doc_id, doc_id FROM documents
              |  UNION
              |  SELECT s.v, reach.r FROM sym s JOIN reach ON s.u = reach.id),
              |comp AS (SELECT id, min(r) AS canon FROM reach GROUP BY 1),
              |rep AS (
              |  SELECT canon, doc_id AS rep_id FROM (
              |    SELECT c.canon, d.doc_id,
              |      row_number() OVER (PARTITION BY c.canon
              |        ORDER BY d.n_chars DESC, d.doc_id ASC) AS rn
              |    FROM comp c JOIN documents d ON c.id = d.doc_id)
              |  WHERE rn = 1)
              |SELECT c.id AS doc_id, r.rep_id
              |FROM comp c JOIN rep r ON c.canon = r.canon""".stripMargin),
      covers = Seq("ext-dedup-keep-best")),

    // ------------------------------------------------------------------
    // Per-SOURCE deterministic cap — the data-mixing primitive: every
    // source contributes at most k documents, chosen by md5-priority (a
    // reproducible uniform sample, not "first k" which biases toward
    // ingest order). One shuffle on source; at 100 TB the window sorts
    // inside each source's partition and hot sources are the only big
    // groups (salt or pre-filter those if a single source dominates).
    QueryDef(
      "q_source_cap_sample",
      (s, dir) => {
        val w = Window
          .partitionBy(col("source"))
          .orderBy(
            substring(md5(col("doc_id").cast("string").cast("binary")), 1, 15),
            col("doc_id"))
        t(s, dir, "documents")
          .withColumn("sample_rank", row_number().over(w))
          .filter(col("sample_rank") <= 50)
          .select(col("doc_id"), col("source"), col("sample_rank"))
      },
      Some("""SELECT doc_id, source, CAST(sample_rank AS INT) AS sample_rank
             |FROM (
             |  SELECT doc_id, source,
             |    row_number() OVER (PARTITION BY source
             |      ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 15), doc_id)
             |      AS sample_rank
             |  FROM documents)
             |WHERE sample_rank <= 50""".stripMargin),
      covers = Seq("ext-source-cap")),

    // ------------------------------------------------------------------
    // ASYMMETRIC containment: |A∩B| / min(|A|,|B|) over shingle sets —
    // catches doc-inside-doc relations (boilerplate wrapping, quoted
    // articles) that symmetric Jaccard under-scores when sizes differ.
    // Candidates come from the containment-first prefix index
    // (SetSimJoin.containmentSelfJoin): the smaller side's rarest
    // (1−t)·|A|+1 tokens joined against full postings — a PIGEONHOLE
    // recall guarantee, so extreme size-ratio pairs (a snippet inside a
    // page: containment 1.0, Jaccard 0.03) are found where the earlier
    // Jaccard-LSH banding structurally missed them (SetSimJoinSpec pins
    // exactly that miss). The oracle is therefore the pure quadratic
    // containment truth — no banding replay needed.
    QueryDef(
      "q_containment",
      (s, dir) => {
        val tok = t(s, dir, "documents")
          .select(
            col("doc_id"),
            explode(graft.functions.TextExprs.wordShingles(col("text"), 2)).as("s"))
          .select(col("doc_id"), xxhash64(col("s")).as("h"))
        SetSimJoin.containmentSelfJoin(tok, "doc_id", "h", 0.7)
          .select(
            col("id_a"), col("id_b"),
            // single int→double division: bit-exact, no rounding needed
            (col("inter") * lit(1.0) / least(col("na"), col("nb")))
              .as("containment"))
          .filter(col("containment") >= 0.7)
      },
      Some(s"""WITH sh AS (
              |  $ShinglesSql
              |), sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) n FROM sh GROUP BY 1),
              |pairs AS (
              |  SELECT a.doc_id id_a, b.doc_id id_b, CAST(count(*) AS BIGINT) inter
              |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              |  GROUP BY 1, 2)
              |SELECT id_a, id_b,
              |  inter * 1.0 / least(na.n, nb.n) AS containment
              |FROM pairs
              |JOIN sizes na ON id_a = na.doc_id
              |JOIN sizes nb ON id_b = nb.doc_id
              |WHERE inter * 1.0 / least(na.n, nb.n) >= 0.7""".stripMargin),
      covers = Seq("ext-containment"))
  )
}

/** SimHash column builders shared between the Spark plan and the generated
  * DuckDB oracle so both sides use identical constants.
  */
object SimHash {
  val Bits = 16

  import org.apache.spark.sql.functions._

  def voteCol(h: Column, j: Int): Column =
    sum(when(shiftright(h, j).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1))
      .as(s"s$j")

  /** Single-buffer signature aggregation: ONE Array[Int] of per-bit vote
    * counters replaces `bits` separate `sum(when(...))` aggregates. The
    * 48-lane voteCol form carried 48 independent agg buffers per group
    * over every (doc, word) row — measured as q_simhash_pairs' dominant
    * cost; this folds them into one buffer with tight int-array loops.
    * Vote counts are exact integers, so merge order cannot perturb the
    * result: output is bit-identical to voteCol×bits + packBits (and to
    * the DuckDB oracle's unrolled per-bit sums).
    */
  final class SimHashAgg(bits: Int)
      extends org.apache.spark.sql.expressions.Aggregator[Long, Array[Int], Long] {
    override def zero: Array[Int] = new Array[Int](bits)
    override def reduce(b: Array[Int], h: Long): Array[Int] = {
      var j = 0
      while (j < bits) { b(j) += ((((h >>> j) & 1L) << 1) - 1L).toInt; j += 1 }
      b
    }
    override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
      var j = 0
      while (j < bits) { a(j) += b(j); j += 1 }
      a
    }
    override def finish(b: Array[Int]): Long = {
      var acc = 0L
      var j = 0
      while (j < bits) { if (b(j) > 0) acc |= 1L << j; j += 1 }
      acc
    }
    // native int-array codec (UnsafeArrayData), not kryo: the buffer is
    // (de)serialized on every partial-merge exchange, so the codec is on
    // the hot path
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Int]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Long] =
      org.apache.spark.sql.Encoders.scalaLong
  }

  /** The packed signature as one aggregate expression over the word-hash
    * column (see [[SimHashAgg]]).
    */
  def signatureAgg(h: Column, bits: Int = Bits): Column =
    udaf(new SimHashAgg(bits), org.apache.spark.sql.Encoders.scalaLong).apply(h)

  /** packs the vote signs s0..s{bits-1} into a single BIGINT. */
  def packBits(bits: Int = Bits): Column =
    (0 until bits)
      .map(j => when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
      .cast("long")

  /** DuckDB replay of the signature at any width (≤ 60 usable bits of
    * the md5-derived hash), aliased as requested.
    */
  def oracleFor(bits: Int, alias: String = "simhash"): String = {
    require(bits >= 1 && bits <= 60, s"simhash width 1..60, got $bits")
    val votes = (0 until bits)
      .map(j => s"sum(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS s$j")
      .mkString(",\n    ")
    val pack = (0 until bits)
      .map(j => s"(CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END)")
      .mkString(" + ")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(list_distinct(
       |      list_filter(string_split_regex(lower(text), '\\s+'), x -> x != ''))) AS w
       |  FROM documents),
       |hashed AS (
       |  SELECT doc_id, CAST(concat('0x', substr(md5(w), 1, 15)) AS BIGINT) AS h
       |  FROM tok),
       |votes AS (
       |  SELECT doc_id,
       |    $votes
       |  FROM hashed GROUP BY doc_id)
       |SELECT doc_id, CAST($pack AS BIGINT) AS $alias FROM votes""".stripMargin
  }

  val oracle: String = oracleFor(Bits)
}
