package graft.sources

import graft.SparkSpec
import graft.engine.Session
import org.apache.spark.sql.functions._

class BucketedSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private lazy val tables: Unit = {
    Bucketed.write(Session.table(spark, sf, "lineitem"), "spec_li_bkt", 4, "l_orderkey")
    Bucketed.write(Session.table(spark, sf, "orders"), "spec_ord_bkt", 4, "o_orderkey")
  }

  test("bucket-aligned fact join: sort-merge join with ZERO exchange") {
    tables
    val joined = spark.table("spec_li_bkt")
      .hint("merge")
      .join(spark.table("spec_ord_bkt"), col("l_orderkey") === col("o_orderkey"))
    val plan = planOf(joined)
    assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
    assert(!plan.contains("Exchange"), s"bucket-aligned join must not shuffle:\n$plan")
    // the layout detour changes no values
    val want = Session.table(spark, sf, "lineitem")
      .join(Session.table(spark, sf, "orders"), col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(joined.count() === want)
  }

  test("the join's residual sort is IN-partition only (never an exchange)") {
    tables
    // Spark ≥3.0 ignores in-file sort order by default
    // (spark.sql.legacy.bucketedTableScan.outputOrdering=false), so a
    // local Sort IS planned below the merge — the point of bucketing is
    // that the SHUFFLE is gone: sort cost is per-partition O(n log n) with
    // no network, and the layout guarantees one file per bucket so the
    // legacy flag can reclaim even the sort where it matters.
    val joined = spark.table("spec_li_bkt")
      .hint("merge")
      .join(spark.table("spec_ord_bkt"), col("l_orderkey") === col("o_orderkey"))
    val plan = planOf(joined)
    assert(plan.contains("Sort "), s"expected the default local re-sort:\n$plan")
    assert(!plan.contains("Exchange"), s"the sort must be exchange-free:\n$plan")
  }

  test("groupBy on the bucket key aggregates with ZERO exchange") {
    tables
    val agg = spark.table("spec_li_bkt")
      .groupBy("l_orderkey")
      .agg(round(sum("l_quantity"), 2).as("q"))
    val plan = planOf(agg)
    assert(!plan.contains("Exchange"), s"bucket-aligned aggregation must not shuffle:\n$plan")
    val want = Session.table(spark, sf, "lineitem")
      .groupBy("l_orderkey").agg(round(sum("l_quantity"), 2).as("q"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val got = agg.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got === want)
  }

  test("mismatched bucket counts still answer correctly (one side re-shuffles)") {
    tables
    Bucketed.write(Session.table(spark, sf, "orders"), "spec_ord_bkt2", 2, "o_orderkey")
    val joined = spark.table("spec_li_bkt")
      .hint("merge")
      .join(spark.table("spec_ord_bkt2"), col("l_orderkey") === col("o_orderkey"))
    val want = Session.table(spark, sf, "lineitem")
      .join(Session.table(spark, sf, "orders"), col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(joined.count() === want)
  }
}
