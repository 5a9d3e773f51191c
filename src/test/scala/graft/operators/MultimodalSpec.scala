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

  test("withFeatureNorm computes the L2 norm of features") {
    val r = Multimodal.withFeatureNorm(Multimodal.decodeFeatures(media).limit(5))
      .select(col("features"), col("feat_norm")).head()
    val manual = math.sqrt(r.getSeq[Double](0).map(x => x * x).sum)
    assert(math.abs(r.getDouble(1) - manual) < 1e-12)
  }
}
