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
    // Resize/downsample as projection: keep every 4th payload byte (the
    // nearest-neighbor thumbnail shape — a real resize swaps the stub
    // kernel, the plumbing is identical).
    QueryDef(
      "q_multimodal_resize",
      (s, dir) =>
        media(s, dir)
          .select(
            col("doc_id"),
            octet_length(Multimodal.resampleStub(col("media"), 4)).as("thumb_len"),
            md5(Multimodal.resampleStub(col("media"), 4)).as("thumb_digest")),
      Some("""SELECT doc_id,
             |  CAST(octet_length(encode(regexp_replace(text, '(?s)(.)(.{0,3})', '\1', 'g'))) AS INT) AS thumb_len,
             |  md5(regexp_replace(text, '(?s)(.)(.{0,3})', '\1', 'g')) AS thumb_digest
             |FROM documents""".stripMargin),
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
