package graft.queries

import graft.QueryDef
import graft.QueryDef.t
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal-column queries over `documents` with the text payload cast
  * to binary as a deterministic stand-in for media bytes (the container
  * has no codecs; see graft.operators.Multimodal). Everything the oracle
  * checks — metadata, frame sampling, stub-decode dimensions — exercises
  * the REAL Spark plumbing: binary columns, typed metadata structs,
  * projection-only frame slicing, and the mapPartitions batch decode.
  *
  * ORACLE PARITY ASSUMPTION: the oracles slice characters (DuckDB has no
  * byte-level blob substr) while the engine slices bytes, so hash parity
  * requires ASCII, CR-free payloads. The fixture corpus satisfies this and
  * MultimodalSpec enforces it ("oracle parity precondition" test).
  */
object MultimodalQ {

  private def media(s: org.apache.spark.sql.SparkSession, dir: String) =
    t(s, dir, "documents").select(col("doc_id"), col("text").cast("binary").as("media"))

  val defs: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    // Typed payload metadata: one codegen'd scan, no decode.
    QueryDef(
      "q_multimodal_meta",
      (s, dir) =>
        Multimodal.withMetadata(media(s, dir))
          .select(
            col("doc_id"),
            col("media_meta.byte_len").as("byte_len"),
            col("media_meta.digest").as("digest"),
            col("media_meta.magic").as("magic")),
      Some("""SELECT doc_id,
             |  CAST(octet_length(encode(text)) AS INT) AS byte_len,
             |  md5(text) AS digest,
             |  hex(encode(substr(text, 1, 4))) AS magic
             |FROM documents""".stripMargin),
      covers = Seq("ext-multimodal-meta")),

    // ------------------------------------------------------------------
    // Frame sampling as pure projection: 4 frames x 10 bytes, stride 10.
    QueryDef(
      "q_multimodal_frames",
      (s, dir) =>
        media(s, dir)
          .select(
            col("doc_id"),
            posexplode(Multimodal.frameSample(col("media"), n = 4, frameLen = 10, stride = 10)))
          .select(
            col("doc_id"),
            col("pos").as("frame_no"),
            octet_length(col("col")).as("frame_len"),
            md5(col("col")).as("frame_digest")),
      Some("""SELECT doc_id, CAST(i AS INT) AS frame_no,
             |  CAST(octet_length(encode(substr(text, CAST(1 + i * 10 AS INT), 10))) AS INT) AS frame_len,
             |  md5(substr(text, CAST(1 + i * 10 AS INT), 10)) AS frame_digest
             |FROM documents, range(0, 4) t(i)""".stripMargin),
      covers = Seq("ext-multimodal-frames")),

    // ------------------------------------------------------------------
    // REAL nearest-neighbor resize over genuine P6 images: each document
    // synthesizes a deterministic 16x16 binary-PPM (pixel bytes cycle
    // through the text — both engines can construct it byte-identically),
    // Spark then runs the real codec path (parse header → keep pixel
    // (4r, 4c) → re-encode P6) in micro-batched mapPartitions, and the
    // oracle computes the identical resized bytes analytically: output
    // pixel-byte i pulls source pixel-section byte
    // (i/12)*192 + ((i/3)%4)*12 + i%3 of the cyclic text. Digest parity
    // proves the decoded-pixel output, not a byte-stride stub.
    QueryDef(
      "q_multimodal_resize",
      (s, dir) => {
        // cyclic pixel bytes via repeat+substring — one codegen'd string
        // op per row; the per-character higher-order-function formulation
        // is CodegenFallback and measured 9.5 s at sf0.1 (768 interpreted
        // lambda calls per document) vs ~0.4 s for this form.
        val src = t(s, dir, "documents")
          .filter(length(col("text")) >= 1)
          .select(
            col("doc_id"),
            concat(
              lit("P6\n16 16\n255\n"),
              substring(
                expr("repeat(text, CAST(767 div length(text) + 1 AS INT))"), 1, 768))
              .cast("binary").as("media"))
        Multimodal.resizePpmBatched(src, factor = 4)
          .select(
            col("doc_id"),
            col("width"),
            col("height"),
            octet_length(col("thumb")).as("thumb_len"),
            md5(col("thumb")).as("thumb_digest"))
      },
      Some("""WITH px AS (
             |  SELECT doc_id, i,
             |    substr(text, CAST(((i // 12) * 192 + ((i // 3) % 4) * 12 + i % 3)
             |      % length(text) AS INT) + 1, 1) AS ch
             |  FROM documents, range(0, 48) t(i)
             |  WHERE length(text) >= 1),
             |thumb AS (
             |  SELECT doc_id,
             |    'P6' || chr(10) || '4 4' || chr(10) || '255' || chr(10) ||
             |      string_agg(ch, '' ORDER BY i) AS img
             |  FROM px GROUP BY doc_id)
             |SELECT doc_id, CAST(4 AS INT) AS width, CAST(4 AS INT) AS height,
             |  CAST(octet_length(encode(img)) AS INT) AS thumb_len,
             |  md5(img) AS thumb_digest
             |FROM thumb""".stripMargin),
      covers = Seq("ext-multimodal-resize")),

    // ------------------------------------------------------------------
    // Batch decode (mapPartitions micro-batches): the oracle reproduces
    // the stub's deterministic dimensions; features are spec-tested.
    QueryDef(
      "q_multimodal_decode",
      (s, dir) =>
        Multimodal.decodeFeatures(media(s, dir))
          .select(col("doc_id"), col("width"), col("height"), col("channels")),
      Some("""SELECT doc_id,
             |  CAST(1 + ascii(substr(text, 1, 1)) AS INT) AS width,
             |  CAST(1 + ascii(substr(text, 2, 1)) AS INT) AS height,
             |  CAST(3 AS INT) AS channels
             |FROM documents""".stripMargin),
      covers = Seq("ext-multimodal-decode"))
  )
}
