package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Relational2Spec extends SparkSpec {

  test("approx_count_distinct within 5% of exact per group") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val rows = orders
      .groupBy("o_orderpriority")
      .agg(
        countDistinct("o_custkey").as("exact"),
        approx_count_distinct("o_custkey", 0.02).as("approx"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (exact, approx) = (r.getLong(1), r.getLong(2))
      assert(math.abs(approx - exact) <= math.max(1L, (exact * 0.05).toLong),
        s"${r.getString(0)}: approx=$approx exact=$exact")
    }
  }

  test("as-of join matches every event to its user's latest prior order") {
    val q = graft.SparkEntry.queries("q_asof_join")(spark, sf)
    val events = graft.engine.Session.events(spark, sf)
    assert(q.count() > 0)
    // every matched event appears at most once
    assert(q.groupBy("event_id").count().filter(col("count") > 1).count() === 0)
    assert(q.count() <= events.count())
  }
}
