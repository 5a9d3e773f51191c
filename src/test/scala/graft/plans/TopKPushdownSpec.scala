package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The automatic window→PartialTopK rewrite: users who write the plain
  * row_number idiom get the map-side pruning the explicit TopK.perKey
  * callers get, and every gate that must NOT fire, doesn't.
  */
class TopKPushdownSpec extends SparkSpec {

  private val s = spark
  import s.implicits._

  private def base: DataFrame =
    (1 to 200).map(i => ((i % 5).toLong, (i * 37 % 101).toDouble, i.toLong))
      .toDF("g", "v", "tie").repartition(4)

  private def planOf(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  private val w = Window.partitionBy("g").orderBy(col("v").desc, col("tie").asc)

  test("plain row_number <= k filter plans PartialTopKExec automatically") {
    val df = base.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
    assert(planOf(df).contains("PartialTopK"),
      "the idiomatic top-k window must be auto-pruned")
    // and the result is exactly the window semantics (smallest ties on
    // ord collisions — the operator-level boundary contract)
    val expected = base.collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
      .groupBy(_._1).values.flatMap(rows =>
        rows.sortBy(t => (-t._2, t._3)).take(3)).toSet
    val got = df.select("g", "v", "tie").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(got === expected)
  }

  test("fires from a conjunctive filter and keeps the residual predicate") {
    val df = base.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2 && col("v") > 50.0)
    assert(planOf(df).contains("PartialTopK"))
    df.select("v").as[Double].collect().foreach(v => assert(v > 50.0))
  }

  test("rank() does NOT fire (boundary ties must survive a rank filter)") {
    val df = base.withColumn("rn", rank().over(w)).filter(col("rn") <= 3)
    assert(!planOf(df).contains("PartialTopK"))
  }

  test("a second window expression over the spec blocks the rewrite") {
    val df = base
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("g")))
      .filter(col("rn") <= 3)
    assert(!planOf(df).contains("PartialTopK"))
  }

  test("single-column order (no deterministic tie) does not fire") {
    val df = base
      .withColumn("rn", row_number().over(Window.partitionBy("g").orderBy(col("v").desc)))
      .filter(col("rn") <= 3)
    assert(!planOf(df).contains("PartialTopK"))
  }

  test("long ord does not fire (2^53 double-precision hazard)") {
    val df = base.withColumn("lv", col("tie") * 1000000L)
      .withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy(col("lv").desc, col("tie").asc)))
      .filter(col("rn") <= 3)
    assert(!planOf(df).contains("PartialTopK"))
  }

  test("column-valued bound (no static k) does not fire") {
    val df = base.withColumn("kcol", (col("g") + 1).cast("int"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= col("kcol"))
    assert(!planOf(df).contains("PartialTopK"))
  }

  test("rn == 1 (latest-per-key idiom) fires with k=1") {
    val df = base.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    val plan = planOf(df)
    assert(plan.contains("PartialTopK"))
    assert(df.count() === 5)
  }
}
