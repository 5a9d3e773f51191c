package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorMeanSpec extends SparkSpec {

  test("vector_mean Aggregator == posexplode+avg, partition-invariant") {
    spark.udf.register("vector_mean", udaf(VectorMean))
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("label"), col("embedding").cast("array<double>").as("v"))

    // many partitions force non-trivial partial/merge paths
    val centroids = e.repartition(7)
      .groupBy("label")
      .agg(expr("vector_mean(v)").as("c"))
      .collect()
      .map(r => r.get(0) -> r.getSeq[Double](1))
      .toMap

    val longForm = e
      .select(col("label"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy("label", "dim").agg(avg("x").as("m"))
      .collect()
      .map(r => (r.get(0), r.getInt(1)) -> r.getDouble(2))
      .toMap

    assert(centroids.nonEmpty)
    longForm.foreach { case ((label, dim), m) =>
      assert(math.abs(centroids(label)(dim) - m) < 1e-9, s"($label, $dim)")
    }
  }

  test("winnowing shares a fingerprint for any long shared substring") {
    val s = spark
    import s.implicits._
    val shared = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, s"PREFIX AAA $shared SUFFIX BBB"),
      (2L, s"totally different head $shared and another tail")).toDF("doc_id", "text")
    val fps = graft.operators.Winnow.fingerprintRows(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val f1 = fps.filter(_._1 == 1L).map(_._2).toSet
    val f2 = fps.filter(_._1 == 2L).map(_._2).toSet
    assert((f1 & f2).nonEmpty, "shared substring >= k+w-1 chars must share a fingerprint")
  }
}
