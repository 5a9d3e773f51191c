package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {

  test("bloom semi join equals the plain semi join (exactness)") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val hot = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_totalprice") > 400000.0)
      .select(col("o_orderkey"))
    val expected = li.join(hot, col("l_orderkey") === col("o_orderkey"), "left_semi")
    val got = BloomJoin.semiJoin(li, "l_orderkey", hot, "o_orderkey", expectedItems = 1L << 16)
    assert(got.count() === expected.count())
    assert(got.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(got).count() === 0)
    assert(got.count() > 0, "fixture must produce a non-trivial join")
  }

  test("the bloom pre-filter actually thins the probe side") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val hot = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_totalprice") > 400000.0)
      .select(col("o_orderkey"))
    val bf = BloomJoin.buildFilter(hot, "o_orderkey", expectedItems = 1L << 16, fpp = 0.01)
    val total = li.count()
    val kept = li.filter(BloomJoin.mightContain(bf, col("l_orderkey"))).count()
    val trueMatches = li
      .join(hot, col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    assert(kept >= trueMatches, "bloom must never drop a true match")
    // kept = matches + false positives; fpp 1% over the non-matching rows
    assert(kept <= trueMatches + ((total - trueMatches) * 0.05).toLong + 10,
      s"kept=$kept matches=$trueMatches total=$total — filter is not selective")
    assert(kept < total, "filter must remove something")
  }

  test("might_contain survives whole-stage codegen in the probe plan") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val bf = BloomJoin.buildFilter(
      spark.range(100).toDF("k"), "k", expectedItems = 1000)
    val plan = li.filter(BloomJoin.mightContain(bf, col("l_orderkey")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.take(500))
  }
}
