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
      covers = Seq("ext-pii-redact"))
  )
}
