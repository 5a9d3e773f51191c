package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch tool: print `explain("formatted")` for operator frames the
  * query bodies materialize internally (their QueryDef dump is just the
  * checkpoint readback). Hand-wired per investigation; keep cases cheap.
  *
  *   tools/run_graft.sh graft.tools.ExplainAdhoc <sfDir> <case>
  */
object ExplainAdhoc {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val which = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark: SparkSession =
      graft.engine.Session.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val Sim = graft.operators.Similarity
    which match {
      case "ivfpq_probe" =>
        val b = graft.operators.Pq.seededBooks(64)
        val e = Sim.withNorm(
          graft.engine.Session.table(spark, sfDir, "embeddings")).cache()
        val query = e.filter(col("vec_id") === 0)
          .select(col("v")).head().getSeq[Double](0).toSeq
        val centroids = Sim.trainIvfDistributed(e, "vec_id", k = 16, iters = 4)
        val probe = graft.operators.Pq.ivfPqTopK(
          e.filter(col("vec_id") =!= 0), "vec_id", query,
          k = 10, centroids, b, nProbe = 6)
        probe.explain("formatted")
        println(s"== input partitions: ${e.rdd.getNumPartitions}, rows: ${e.count()}")
        for (r <- 1 to 4) {
          val t0 = System.nanoTime()
          probe.write.format("noop").mode("overwrite").save()
          println(f"== probe noop rep $r: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        }
        println("== executed plan (final):")
        println(probe.queryExecution.executedPlan.toString.linesIterator
          .take(40).mkString("\n"))
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
        for (r <- 1 to 2) {
          val t0 = System.nanoTime()
          probe.write.format("noop").mode("overwrite").save()
          println(f"== probe noop NO-WSCG rep $r: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        }
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        spark.conf.set("spark.sql.codegen.hugeMethodLimit", "8000")
        for (r <- 1 to 3) {
          val t0 = System.nanoTime()
          probe.write.format("noop").mode("overwrite").save()
          println(f"== probe noop HML8000 rep $r: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        }
      case other => sys.error(s"unknown case: $other")
    }
    spark.stop()
  }
}
