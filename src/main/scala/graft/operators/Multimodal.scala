package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata alongside — the columnar shape a
  * 100 TB media pipeline needs (parquet stores the blobs page-compressed;
  * metadata predicates prune scans without touching payload bytes).
  *
  * Three layers:
  *   - [[withMetadata]] — typed metadata struct derived from the payload
  *     (length, content digest, magic prefix) as native expressions: one
  *     scan, codegen'd, no decode;
  *   - [[frameSample]] — fixed-stride byte-range sampling (the "grab N
  *     frames" access pattern) as native `substring` on binary, so frame
  *     extraction pushes down to a projection, not a UDF;
  *   - [[decodeFeatures]] — per-batch decode + feature extraction via
  *     `mapPartitions` with explicit micro-batching: the iterator is
  *     chunked so a real codec would amortize per-batch setup (model
  *     load, GPU transfer) across `batchSize` rows — the Scala analogue
  *     of a vectorized/Arrow UDF.
  *
  * STUB NOTE: this container has no image/audio codecs, so the decode in
  * [[decodeFeatures]] is a clearly-marked deterministic fake (byte
  * statistics standing in for pixels). The Spark-side contract — schema,
  * batching, partitioning, null passthrough — is real and tested; swap
  * `fakeDecode` for a codec call to productionize.
  */
object Multimodal {

  /** media payload metadata: length, md5 digest, first-4-bytes magic. */
  def withMetadata(df: DataFrame, binCol: String = "media"): DataFrame =
    df.withColumn(
      "media_meta",
      struct(
        octet_length(col(binCol)).as("byte_len"),
        md5(col(binCol)).as("digest"),
        hex(substring(col(binCol), 1, 4)).as("magic")))

  /** n fixed-size byte frames sampled at stride `stride` from offset 1.
    * Pure projection — at scale this reads only the pages backing the
    * sampled ranges when the payload column is chunked.
    */
  def frameSample(bin: org.apache.spark.sql.Column, n: Int, frameLen: Int, stride: Int)
      : org.apache.spark.sql.Column =
    array((0 until n).map(i => substring(bin, 1 + i * stride, frameLen)): _*)

  /** ??? real resample goes here ??? — stride-`factor` downsample stub
    * (keep every factor-th byte): the payload-side shape of a
    * nearest-neighbor thumbnail resize, as a pure projection. The capture
    * group regex keeps byte 1 of every `factor`-byte run — identical
    * semantics in the oracle dialect.
    */
  def resampleStub(payload: org.apache.spark.sql.Column, factor: Int)
      : org.apache.spark.sql.Column = {
    require(factor >= 2, s"downsample factor must be >= 2, got $factor")
    // (?s): '.' must match newlines — Java regex '.' excludes \r and
    // Unicode line terminators by default while RE2 (the oracle dialect)
    // excludes only \n, so without DOTALL the two sides disagree on any
    // payload containing \r.
    regexp_replace(payload.cast("string"), s"(?s)(.)(.{0,${factor - 1}})", "$1")
      .cast("binary")
  }

  /** Output schema of [[decodeFeatures]]. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** ??? real decode goes here ??? — deterministic fake standing in for a
    * codec: "dimensions" from the first payload bytes, "features" = a
    * 16-bin byte histogram normalized to frequencies.
    */
  private[operators] def fakeDecode(bytes: Array[Byte]): (Int, Int, Int, Array[Double]) = {
    val w = 1 + (if (bytes.length > 0) bytes(0) & 0x7f else 0)
    val h = 1 + (if (bytes.length > 1) bytes(1) & 0x7f else 0)
    val hist = new Array[Double](16)
    bytes.foreach(b => hist((b & 0xff) >> 4) += 1.0)
    val n = math.max(1, bytes.length)
    (w, h, 3, hist.map(_ / n))
  }

  /** (id, media) → (doc_id, width, height, channels, features), decoding
    * in micro-batches of `batchSize` rows per partition.
    */
  def decodeFeatures(
      df: DataFrame,
      idCol: String = "doc_id",
      binCol: String = "media",
      batchSize: Int = 64): DataFrame = {
    val in = df.select(col(idCol).cast("long"), col(binCol))
    val enc = org.apache.spark.sql.Encoders.row(decodedSchema)
    in.mapPartitions { rows =>
      // explicit micro-batching: a real decoder would set up once per
      // batch (codec context / model / device buffer) and decode the
      // batch vectorized — same shape as a pandas/Arrow batch UDF.
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.collect {
          case r if !r.isNullAt(1) =>
            val (w, h, c, feat) = fakeDecode(r.getAs[Array[Byte]](1))
            Row(r.getLong(0), w, h, c, feat.toSeq)
        }
      }
    }(enc)
  }

  /** cosine-ready feature norm, reusing the native dot kernel. */
  def withFeatureNorm(df: DataFrame, featCol: String = "features"): DataFrame =
    df.withColumn(
      "feat_norm",
      sqrt(graft.functions.VectorExprs.dotProduct(col(featCol), col(featCol))))
}
