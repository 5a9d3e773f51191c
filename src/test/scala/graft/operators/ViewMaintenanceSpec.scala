package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ViewMaintenanceSpec extends SparkSpec {

  private val s = spark
  import s.implicits._

  private def rows(n: Int) = (1 to n).map { i =>
    (s"g${i % 7}", i.toLong, i * 1.5, i % 13)
  }

  private def aggState(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("g").agg(
      count(lit(1)).as("n"),
      sum(col("v")).as("sv"),
      min(col("m")).as("mn"),
      max(col("m")).as("mx"))

  test("merging batch views equals the full recompute") {
    val data = rows(500).toDF("g", "id", "v", "m")
    // three arbitrary batches (uneven sizes, overlapping groups)
    val batches = Seq(
      data.filter(col("id") % 5 < 2),
      data.filter(col("id") % 5 === 2),
      data.filter(col("id") % 5 > 2))
    val merged = ViewMaintenance.merge(
      batches.map(aggState), Seq("g"),
      Seq("n" -> "sum", "sv" -> "sum", "mn" -> "min", "mx" -> "max"))
    val full = aggState(data)
    val m = merged.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getDouble(2), r.getInt(3), r.getInt(4)))).toMap
    val f = full.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getDouble(2), r.getInt(3), r.getInt(4)))).toMap
    assert(m.keySet === f.keySet)
    f.foreach { case (g, (n, sv, mn, mx)) =>
      val (n2, sv2, mn2, mx2) = m(g)
      assert(n2 === n && mn2 === mn && mx2 === mx)
      assert(math.abs(sv2 - sv) < 1e-9, s"group $g sum drifted")
    }
  }

  test("an empty delta is a no-op on the view") {
    val data = rows(100).toDF("g", "id", "v", "m")
    val view = aggState(data)
    val empty = aggState(data.filter(lit(false)))
    val merged = ViewMaintenance.merge(
      Seq(view, empty), Seq("g"),
      Seq("n" -> "sum", "sv" -> "sum", "mn" -> "min", "mx" -> "max"))
    assert(merged.count() === view.count())
    val m = merged.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    view.collect().foreach(r => assert(m(r.getString(0)) === r.getLong(1)))
  }

  test("non-mergeable ops are rejected with a named column") {
    val v = aggState(rows(10).toDF("g", "id", "v", "m"))
    val e = intercept[IllegalArgumentException] {
      ViewMaintenance.merge(Seq(v), Seq("g"), Seq("sv" -> "avg"))
    }
    assert(e.getMessage.contains("sv") && e.getMessage.contains("avg"))
  }
}
