package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.types._

/** Probe: does this Spark's parquet reader promote narrower physical
  * types to a wider requested schema (the SPARK-40876 widening read)?
  * Metadata-only type widening stands on this.
  */
class WideningProbeSpec extends SparkSpec {

  test("parquet int32 file reads under a bigint schema; float under double") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("widen_probe").toString
    Seq((1, 1.5f), (2, 2.5f)).toDF("i", "f").write.parquet(s"$dir/p")
    val widened = StructType(Seq(
      StructField("i", LongType, nullable = true),
      StructField("f", DoubleType, nullable = true)))
    val got = s.read.schema(widened).parquet(s"$dir/p")
      .orderBy("i").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq === Seq((1L, 1.5), (2L, 2.5)))
    // and with the vectorized reader explicitly off (the row-based path)
    s.conf.set("spark.sql.parquet.enableVectorizedReader", "false")
    try {
      val got2 = s.read.schema(widened).parquet(s"$dir/p")
        .orderBy("i").collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(got2.toSeq === Seq((1L, 1.5), (2L, 2.5)))
    } finally s.conf.set("spark.sql.parquet.enableVectorizedReader", "true")
  }
}
