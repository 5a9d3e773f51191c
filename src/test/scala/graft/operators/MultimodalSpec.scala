package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private def media = spark.read.parquet(s"$sf/documents.parquet")
    .select(col("doc_id"), col("text").cast("binary").as("media"))

  test("decodeFeatures is deterministic and batch-size invariant") {
    val a = Multimodal.decodeFeatures(media, batchSize = 3).collect()
      .map(r => r.getLong(0) -> r.toSeq).toMap
    val b = Multimodal.decodeFeatures(media, batchSize = 1000).collect()
      .map(r => r.getLong(0) -> r.toSeq).toMap
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("stub features are a normalized byte histogram") {
    val rows = Multimodal.decodeFeatures(media).limit(20).collect()
    rows.foreach { r =>
      val feats = r.getSeq[Double](4)
      assert(feats.length === 16)
      assert(math.abs(feats.sum - 1.0) < 1e-9, s"histogram must sum to 1, got ${feats.sum}")
    }
  }

  test("null payloads are skipped, not decoded") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "abc"), (2L, null)).toDF("doc_id", "txt")
      .select(col("doc_id"), col("txt").cast("binary").as("media"))
    val out = Multimodal.decodeFeatures(df).collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("frameSample slices equal substring bytes") {
    val got = media
      .select(col("doc_id"), Multimodal.frameSample(col("media"), 2, 5, 7).as("f"))
      .select(col("doc_id"), col("f")(0).cast("string").as("f0"), col("f")(1).cast("string").as("f1"))
    val exp = spark.read.parquet(s"$sf/documents.parquet")
      .select(
        col("doc_id"),
        substring(col("text"), 1, 5).as("f0"),
        substring(col("text"), 8, 5).as("f1"))
    assert(got.exceptAll(exp).count() === 0)
    assert(exp.exceptAll(got).count() === 0)
  }

  test("oracle parity precondition: document payloads are ASCII and CR-free") {
    // The q_multimodal_* oracles slice with char-based substr()/ascii()
    // while the engine slices bytes; DuckDB has no byte-level blob substr,
    // so parity is byte-exact only for ASCII, CR-free payloads. Enforce
    // that assumption on the fixture corpus instead of assuming silently.
    val bad = spark.read.parquet(s"$sf/documents.parquet")
      .filter(
        octet_length(col("text")) =!= length(col("text")) ||
          col("text").contains("\r"))
      .count()
    assert(bad === 0L, "documents.text must be ASCII and CR-free for the multimodal oracles")
  }

  test("decodePpm decodes a real binary-PPM image through the batch path") {
    val s = spark
    import s.implicits._
    // 2x2 P6 with a header comment: black, white, red, blue pixels →
    // Rec.601 lumas 0, 255, 76, 29 → histogram bins 0, 15, 4, 1.
    val header = "P6\n# tiny fixture\n2 2\n255\n".getBytes("US-ASCII")
    val pixels = Array(0, 0, 0, 255, 255, 255, 255, 0, 0, 0, 0, 255).map(_.toByte)
    val txt = "hello world".getBytes("US-ASCII")
    val df = Seq((1L, header ++ pixels), (2L, txt)).toDF("doc_id", "media")
    val out = Multimodal.decodeFeatures(df).collect().map(r => r.getLong(0) -> r).toMap
    val img = out(1L)
    assert((img.getInt(1), img.getInt(2), img.getInt(3)) === ((2, 2, 3)))
    val feats = img.getSeq[Double](4)
    assert(feats(0) === 0.25 && feats(1) === 0.25 && feats(4) === 0.25 && feats(15) === 0.25)
    assert(feats.sum === 1.0)
    // non-image payload falls back to the deterministic stand-in
    val fb = out(2L)
    assert(fb.getInt(1) === 1 + ('h' & 0x7f))
    assert(fb.getInt(2) === 1 + ('e' & 0x7f))
  }

  test("decodePpm rejects malformed payloads instead of misparsing") {
    val cases = Seq(
      "P6\n2 2\n255\n".getBytes("US-ASCII"), // header only, no pixels
      "P6\n2 2\n70000\n".getBytes("US-ASCII") ++ Array.fill(12)(0.toByte), // maxval > 255
      "P5\n2 2\n255\n".getBytes("US-ASCII") ++ Array.fill(12)(0.toByte), // wrong magic
      ("P6\n2 2\n255\n" + "x" * 11).getBytes("US-ASCII"), // short pixel data
      ("P6\n2 2\n255\n" + "x" * 13).getBytes("US-ASCII")) // trailing junk
    cases.foreach(b => assert(Multimodal.decodePpm(b).isEmpty, b.length.toString))
  }

  test("withFeatureNorm computes the L2 norm of features") {
    val r = Multimodal.withFeatureNorm(Multimodal.decodeFeatures(media).limit(5))
      .select(col("features"), col("feat_norm")).head()
    val manual = math.sqrt(r.getSeq[Double](0).map(x => x * x).sum)
    assert(math.abs(r.getDouble(1) - manual) < 1e-12)
  }
}
