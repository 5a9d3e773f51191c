package graft.plans

import graft.SparkSpec
import graft.functions.VectorExprs
import org.apache.spark.sql.functions._

/** The HOF-dot-product rewrite must fire on the exact portable shape (both
  * lambda argument orders), produce the kernel's results, and leave any
  * other aggregate untouched.
  */
class NativeKernelRulesSpec extends SparkSpec {

  private val Hof =
    "aggregate(zip_with(v, w, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"

  private def vectors = spark.read.parquet(s"$sf/embeddings.parquet")
    .select(
      col("vec_id"),
      col("embedding").cast("array<double>").as("v"),
      col("embedding").cast("array<double>").as("w"))

  test("rewrites the portable HOF shape to the codegen'd kernel") {
    val df = vectors.select(expr(Hof).as("d"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("dot_product("), s"kernel missing from: $optimized")
    assert(!optimized.contains("aggregate("), "HOF shape must be gone")
  }

  test("commuted lambdas rewrite too") {
    val df = vectors.select(
      expr("aggregate(zip_with(v, w, (x, y) -> y * x), 0D, (acc, x) -> x + acc)").as("d"))
    assert(df.queryExecution.optimizedPlan.toString.contains("dot_product("))
  }

  test("rewritten results equal the explicit kernel on real vectors") {
    val viaRule = vectors.select(col("vec_id"), expr(Hof).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaKernel = vectors
      .select(col("vec_id"), VectorExprs.dotProduct(col("v"), col("w")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaRule === viaKernel)
    assert(viaRule.nonEmpty)
  }

  test("non-matching shapes are left alone") {
    // different zero, different combiner: must stay an aggregate
    val other = vectors.select(
      expr("aggregate(zip_with(v, w, (x, y) -> x * y), 1D, (acc, x) -> acc + x)").as("d"))
    assert(!other.queryExecution.optimizedPlan.toString.contains("dot_product("))
    val maxAgg = vectors.select(
      expr("aggregate(zip_with(v, w, (x, y) -> x * y), 0D, (acc, x) -> greatest(acc, x))").as("d"))
    assert(!maxAgg.queryExecution.optimizedPlan.toString.contains("dot_product("))
  }
}
