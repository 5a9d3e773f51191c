package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an `Array[Float]` embedding
  * column.
  *
  * Two paths:
  *   - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline.
  *     One broadcast of the query + one scan; fine for a single query even
  *     at 100 TB (it's a map + takeOrdered), wrong for query BATCHES.
  *   - [[lshBuckets]] / [[annTopK]]: sign-random-projection LSH — vectors
  *     hash to a bucket by the sign pattern of `nPlanes` fixed random
  *     hyperplanes; a query probes only its bucket (and optionally
  *     neighboring buckets), turning the scan into a partition-pruned
  *     lookup. Planes are generated from a fixed seed so bucketing is
  *     deterministic and reproducible across runs/engines.
  */
object Similarity {

  /** embedding as double array + L2 norm, reusable fragment. */
  def withNorm(df: DataFrame, embCol: String = "embedding"): DataFrame =
    df.withColumn("v", transform(col(embCol), _.cast("double")))
      .withColumn("norm", sqrt(aggregate(col("v"), lit(0.0), (acc, x) => acc + x * x)))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Exact cosine top-k of `df` vs one query vector (driver-side Seq). */
  def bruteForceTopK(
      df: DataFrame,
      idCol: String,
      query: Seq[Double],
      k: Int): DataFrame = {
    val qNorm = math.sqrt(query.map(x => x * x).sum)
    val qCol = array(query.map(lit): _*)
    withNorm(df)
      .select(
        col(idCol),
        (dot(col("v"), qCol) / (col("norm") * lit(qNorm))).as("cos"))
      .orderBy(round(col("cos"), 6).desc, col(idCol))
      .limit(k)
  }

  /** Deterministic random hyperplanes: nPlanes x dim, seed-fixed. */
  def planes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Adds a `bucket` column: bit i = sign(v · plane_i). 2^nPlanes buckets.
    * At scale the table is written partitioned/bucketed by this column so a
    * query reads one bucket, not the corpus.
    */
  def lshBuckets(df: DataFrame, nPlanes: Int, dim: Int, seed: Long = 42L): DataFrame = {
    val ps = planes(nPlanes, dim, seed)
    val bits = ps.zipWithIndex.map { case (p, i) =>
      val pCol = array(p.map(lit): _*)
      when(dot(col("v"), pCol) >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    withNorm(df).withColumn("bucket", bits.reduce(_ + _))
  }

  /** ANN top-k: probe the query's bucket plus all buckets within hamming
    * distance 1 (multi-probe keeps recall up without widening the scan
    * much), exact re-rank inside the candidate set.
    */
  def annTopK(
      bucketed: DataFrame,
      idCol: String,
      query: Seq[Double],
      k: Int,
      nPlanes: Int,
      seed: Long = 42L): DataFrame = {
    val ps = planes(nPlanes, query.size, seed)
    val qBucket = ps.zipWithIndex.map { case (p, i) =>
      val d = p.zip(query).map { case (a, b) => a * b }.sum
      if (d >= 0) 1L << i else 0L
    }.sum
    val probe = qBucket +: (0 until nPlanes).map(i => qBucket ^ (1L << i))
    val qNorm = math.sqrt(query.map(x => x * x).sum)
    val qCol = array(query.map(lit): _*)
    bucketed
      .filter(col("bucket").isin(probe.map(_.asInstanceOf[Any]): _*))
      .select(
        col(idCol),
        (dot(col("v"), qCol) / (col("norm") * lit(qNorm))).as("cos"))
      .orderBy(round(col("cos"), 6).desc, col(idCol))
      .limit(k)
  }
}
