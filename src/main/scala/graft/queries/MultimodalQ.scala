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

  /** Deterministic 16x16 binary-PPM per document (pixel bytes cycle
    * through the text — both engines construct it byte-identically; the
    * cyclic repeat+substring is one codegen'd string op per row, vs 9.5 s
    * at sf0.1 for the per-character HOF formulation). Shared by the
    * resize and perceptual-hash queries.
    */
  private def ppm16(s: org.apache.spark.sql.SparkSession, dir: String) =
    t(s, dir, "documents")
      .filter(length(col("text")) >= 1)
      .select(
        col("doc_id"),
        concat(
          lit("P6\n16 16\n255\n"),
          substring(
            expr("repeat(text, CAST(767 div length(text) + 1 AS INT))"), 1, 768))
          .cast("binary").as("media"))

  /** DuckDB replay of [[graft.operators.Multimodal.dHash]] over the
    * [[ppm16]] images, ending in `dh(doc_id, dhash)`: per-pixel Rec.601
    * luma numerators from the cyclic text bytes, 2x2 cell sums (16/8
    * divides evenly, so the operator's cross-multiplied average compare
    * reduces to a plain sum compare), row-neighbor bits packed with
    * Scala-rendered literal weights (56 bits — positive-BIGINT-safe).
    */
  private val DHashCte: String = {
    val cells = (for { r <- 0 until 8; c <- 0 until 8 } yield
      s"sum(CASE WHEN (i // 3) // 16 // 2 = $r AND ((i // 3) % 16) // 2 = $c THEN wt * v END) AS s${r}_$c")
      .mkString(",\n    ")
    val pack = (for { r <- 0 until 8; c <- 0 until 7 } yield
      s"(CASE WHEN s${r}_$c > s${r}_${c + 1} THEN ${1L << (r * 7 + c)} ELSE 0 END)")
      .mkString(" + ")
    s"""px AS (
       |  SELECT doc_id, i,
       |    ascii(substr(text, CAST(i % length(text) AS INT) + 1, 1)) AS v,
       |    CASE i % 3 WHEN 0 THEN 299 WHEN 1 THEN 587 ELSE 114 END AS wt
       |  FROM documents, range(0, 768) t(i)
       |  WHERE length(text) >= 1),
       |cells AS (
       |  SELECT doc_id,
       |    $cells
       |  FROM px GROUP BY doc_id),
       |dh AS (SELECT doc_id, CAST($pack AS BIGINT) AS dhash FROM cells)""".stripMargin
  }

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
        Multimodal.resizePpmBatched(ppm16(s, dir), factor = 4)
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
      covers = Seq("ext-multimodal-decode")),

    // ------------------------------------------------------------------
    // Perceptual image hash (dHash): 8x8 luminance grid over the decoded
    // raster, 56 bits of brighter-than-right-neighbor comparisons. Runs
    // the REAL codec path (P6 bytes here; PNG/JPEG via javax.imageio
    // hash identically — spec-pinned) in the micro-batched mapPartitions
    // shape; the oracle recomputes every cell sum and bit analytically
    // from the same cyclic pixel bytes.
    QueryDef(
      "q_image_dhash",
      (s, dir) => Multimodal.dHashBatched(ppm16(s, dir)),
      Some(s"""WITH $DHashCte
              |SELECT doc_id, dhash FROM dh""".stripMargin),
      covers = Seq("ext-multimodal-dhash")),

    // ------------------------------------------------------------------
    // Perceptual NEAR-DUP images: pairs within Hamming distance 6 on the
    // 56-bit dHash, found by pigeonhole — 7 blocks of 8 bits; two hashes
    // differing in <= 6 bits MUST agree on some block (guaranteed recall,
    // never all-pairs), popcount-verify on block-collision candidates
    // only. Same shape as q_simhash_pairs; at production bit widths
    // (128/256-bit pHash) the blocks widen to 12-16 bits, giving the
    // same guarantee over a finer bucket space. The oracle brute-forces
    // the quadratic truth (viable only at oracle scale).
    QueryDef(
      "q_image_near_dup",
      (s, dir) => {
        val dh = Multimodal.dHashBatched(ppm16(s, dir))
        val blocks = dh.select(
          col("doc_id"), col("dhash"),
          explode(array((0 until 7).map(b =>
            struct(lit(b).as("blk"),
              shiftright(col("dhash"), b * 8).bitwiseAND(lit(255L)).as("bv"))): _*)).as("bk"))
          .select(col("doc_id"), col("dhash"), col("bk.blk").as("blk"), col("bk.bv").as("bv"))
        blocks.as("a")
          .join(
            blocks.as("b"),
            col("a.blk") === col("b.blk") && col("a.bv") === col("b.bv") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(
            col("a.doc_id").as("id_a"),
            col("b.doc_id").as("id_b"),
            bit_count(col("a.dhash").bitwiseXOR(col("b.dhash"))).as("hamming"))
          .filter(col("hamming") <= 6)
          .distinct()
      },
      Some(s"""WITH $DHashCte
              |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              |  CAST(bit_count(xor(a.dhash, b.dhash)) AS INT) AS hamming
              |FROM dh a JOIN dh b ON a.doc_id < b.doc_id
              |WHERE bit_count(xor(a.dhash, b.dhash)) <= 6""".stripMargin),
      covers = Seq("ext-multimodal-near-dup")),

    // ------------------------------------------------------------------
    // REAL audio decode + windowed DSP features: each document
    // synthesizes a 256-sample 8-bit-mono PCM WAV (44-byte literal
    // header + cyclic text bytes — byte-identical in both engines), the
    // engine runs the strict RIFF chunk-walk codec (graft.operators
    // .Audio) and emits per-64-frame-window exact-integer features. The
    // oracle recomputes energy/zcr/peak analytically from the same
    // cyclic samples. NOTE: the ASCII fixture corpus keeps every
    // centered 8-bit sample negative, so `zcr` is identically 0 in this
    // face — the crossing logic is spec-pinned on signed 16-bit
    // fixtures that straddle zero (AudioSpec).
    QueryDef(
      "q_audio_features",
      (s, dir) => {
        val src = t(s, dir, "documents")
          .filter(length(col("text")) >= 1)
          .select(
            col("doc_id"),
            concat(
              lit(graft.operators.Audio.monoPcm8Header(256)),
              substring(
                expr("repeat(text, CAST(255 div length(text) + 1 AS INT))"), 1, 256)
                .cast("binary")).as("media"))
        graft.operators.Audio.windowFeatures(src, windowSize = 64)
      },
      Some("""WITH smp AS (
             |  SELECT doc_id, i,
             |    ascii(substr(text, CAST(i % length(text) AS INT) + 1, 1)) - 128 AS s
             |  FROM documents, range(0, 256) t(i)
             |  WHERE length(text) >= 1),
             |nxt AS (
             |  SELECT doc_id, i, s,
             |    lead(s) OVER (PARTITION BY doc_id ORDER BY i) AS s2
             |  FROM smp)
             |SELECT doc_id, CAST(i // 64 AS INT) AS win,
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(s * s) AS BIGINT) AS energy,
             |  CAST(sum(CASE WHEN (i + 1) // 64 = i // 64 AND s * s2 < 0
             |           THEN 1 ELSE 0 END) AS BIGINT) AS zcr,
             |  CAST(max(abs(s)) AS BIGINT) AS peak
             |FROM nxt GROUP BY 1, 2""".stripMargin),
      covers = Seq("ext-multimodal-audio")),

    // ------------------------------------------------------------------
    // REAL video-container frame extraction: each document synthesizes a
    // 3-frame GVI0 container (magic + u32 frame count + u32 length table
    // + back-to-back complete P6 frames, pixels cycling the text with a
    // per-frame offset — byte-identical in both engines). The engine runs
    // the REAL parse (index walk, bounds-checked slicing) and the REAL
    // per-frame decode+dHash in one mapPartitions pass
    // (Multimodal.videoFrameDHashes); frameSample's byte-stride stub is
    // superseded for containers. The oracle recomputes every frame's
    // 56-bit dHash analytically from the offset cyclic pixels — digest
    // parity proves decoded frame CONTENT, not slicing arithmetic. The
    // output shape feeds the existing pigeonhole hamming near-dup join
    // unchanged (VideoSpec pins that, plus codec-frame containers and
    // malformed-container behavior, on real fixtures).
    QueryDef(
      "q_video_frames",
      (s, dir) => {
        // container prefix is constant: 3 frames of 13+768 = 781 bytes
        // (13-byte P6 header + 16*16*3 pixel bytes)
        val header = graft.operators.Multimodal.packVideo(
          Seq.fill(3)(new Array[Byte](781))).take(4 + 4 + 12)
        // all-binary concat: the length-table bytes include 0x00, which a
        // string-typed concat would mangle
        val frame = (f: Int) =>
          concat(
            lit("P6\n16 16\n255\n"),
            substring(
              expr("repeat(text, CAST(770 div length(text) + 2 AS INT))"),
              1 + f, 768)).cast("binary")
        val src = t(s, dir, "documents")
          .filter(length(col("text")) >= 1)
          .select(
            col("doc_id"),
            concat(lit(header), frame(0), frame(1), frame(2)).as("media"))
        graft.operators.Multimodal.videoFrameDHashes(src)
      },
      Some(s"""WITH $VideoDHashCte
              |SELECT doc_id, frame_no, dhash FROM vdh""".stripMargin),
      covers = Seq("ext-multimodal-video"))
  )

  /** DuckDB replay of per-frame dHash over the 3-frame GVI0 containers:
    * frame f's pixel i is the cyclic text byte (i + f) % len — the same
    * cell-sum/pack pipeline as [[DHashCte]] with a frame dimension.
    */
  private lazy val VideoDHashCte: String = {
    val cells = (for { r <- 0 until 8; c <- 0 until 8 } yield
      s"sum(CASE WHEN (i // 3) // 16 // 2 = $r AND ((i // 3) % 16) // 2 = $c THEN wt * v END) AS s${r}_$c")
      .mkString(",\n    ")
    val pack = (for { r <- 0 until 8; c <- 0 until 7 } yield
      s"(CASE WHEN s${r}_$c > s${r}_${c + 1} THEN ${1L << (r * 7 + c)} ELSE 0 END)")
      .mkString(" + ")
    s"""vpx AS (
       |  SELECT doc_id, f, i,
       |    ascii(substr(text, CAST((i + f) % length(text) AS INT) + 1, 1)) AS v,
       |    CASE i % 3 WHEN 0 THEN 299 WHEN 1 THEN 587 ELSE 114 END AS wt
       |  FROM documents, range(0, 3) tf(f), range(0, 768) t(i)
       |  WHERE length(text) >= 1),
       |vcells AS (
       |  SELECT doc_id, f,
       |    $cells
       |  FROM vpx GROUP BY doc_id, f),
       |vdh AS (SELECT doc_id, CAST(f AS INT) AS frame_no,
       |  CAST($pack AS BIGINT) AS dhash FROM vcells)""".stripMargin
  }
}
