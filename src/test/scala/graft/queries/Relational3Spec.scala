package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Relational3Spec extends SparkSpec {

  test("approx_percentile lands within the accuracy bound of exact percentile") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val rows = li
      .groupBy("l_returnflag")
      .agg(
        expr("percentile(l_extendedprice, 0.5D)").as("exact"),
        // accuracy 1000 -> rank error <= n/1000 per group
        expr("approx_percentile(l_extendedprice, 0.5D, 1000)").as("approx"),
        count(lit(1)).as("n"),
        min("l_extendedprice").as("lo"),
        max("l_extendedprice").as("hi"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (exact, approx) = (r.getDouble(1), r.getDouble(2))
      val spread = r.getDouble(5) - r.getDouble(4)
      // rank-error sketch: value error bounded loosely by 2% of the spread here
      assert(math.abs(approx - exact) <= spread * 0.02,
        s"${r.getString(0)}: approx=$approx exact=$exact spread=$spread")
    }
  }

  test("train/test split is deterministic and partitions the table") {
    val q = graft.SparkEntry.queries("q_train_test_split")(spark, sf)
    val a = q.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val b = graft.SparkEntry.queries("q_train_test_split")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(a === b, "hash split must be run-to-run deterministic")
    val total = a.values.sum
    val orders = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(total === orders, "split buckets must partition the table exactly")
    val evalFrac = a.collect { case ((s, _), n) if s == "eval" => n }.sum.toDouble / total
    assert(evalFrac > 0.15 && evalFrac < 0.35, s"eval fraction $evalFrac should be ~0.25")
  }

  test("range join places every in-range order in exactly one band") {
    val q = graft.SparkEntry.queries("q_range_join")(spark, sf)
    val joined = q.agg(sum("n")).head().getLong(0)
    val inRange = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_totalprice") >= 1000.0 && col("o_totalprice") < 1000.0 * math.pow(2, 10))
      .count()
    assert(joined === inRange)
  }

  test("interval join emits only strictly-ordered same-user pairs within the gap") {
    val q = graft.SparkEntry.queries("q_interval_join")(spark, sf)
    val ev = graft.engine.Session.events(spark, sf)
      .select(col("event_id"), col("user_id"), expr("ts_ns div 1000").as("us"))
    val check = q
      .join(ev.select(col("event_id").as("ev_a"), col("us").as("us_a")), "ev_a")
      .join(ev.select(col("event_id").as("ev_b"), col("us").as("us_b")), "ev_b")
      .filter(col("us_b") <= col("us_a") || col("us_b") > col("us_a") + expr("3600000000"))
      .count()
    assert(check === 0)
    assert(q.count() > 0)
  }
}
