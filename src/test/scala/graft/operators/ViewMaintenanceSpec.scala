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

  // ----------------------------------------------------------------
  // Retractable extremum: bounded top-k state + fence.
  // ----------------------------------------------------------------

  private def topkOf(df: org.apache.spark.sql.DataFrame, g: String): Seq[Double] = {
    val r = df.filter(col("g") === g).collect()
    if (r.isEmpty) Nil else r.head.getSeq[Double](r.head.fieldIndex("topk")).toSeq
  }

  test("retractTopK: deleting the max repairs from state, no rebuild flag") {
    val base = Seq(("a", 10.0), ("a", 9.0), ("a", 8.0), ("a", 7.0), ("a", 6.0),
      ("b", 3.0)).toDF("g", "v")
    val st0 = ViewMaintenance.rebuildTopK(base, Seq("g"), "v", k = 3)
    assert(topkOf(st0, "a") === Seq(10.0, 9.0, 8.0))
    // fence = the (k+1)-th value: everything truncated is <= 7
    assert(st0.filter(col("g") === "a").head().getAs[Double]("fence") === 7.0)
    val delta = Seq(("a", 10.0, -1L)).toDF("g", "v", "sign")
    val st1 = ViewMaintenance.retractTopK(st0, delta, Seq("g"), "v", "sign", k = 3)
    val a = st1.filter(col("g") === "a").head()
    assert(a.getSeq[Double](a.fieldIndex("topk")).toSeq === Seq(9.0, 8.0))
    assert(a.getAs[Long]("cnt") === 4L)
    assert(!a.getAs[Boolean]("needs_rebuild"),
      "a buffered runner-up must answer without a rebuild")
    val ans = ViewMaintenance.repairExtremum(
      st1, base.filter(col("v") =!= 10.0), Seq("g"), "v", "mx")
    assert(ans.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap ===
      Map("a" -> 9.0, "b" -> 3.0))
  }

  test("retractTopK: head falling below the fence flags EXACTLY that group") {
    // the unsound-naive-top-k counterexample: k=2 over {10,9,8}; delete 10,
    // insert 1, delete 9 -> a fence-less buffer would answer 1 (true max 8)
    val base = Seq(("a", 10.0), ("a", 9.0), ("a", 8.0), ("b", 5.0)).toDF("g", "v")
    val st0 = ViewMaintenance.rebuildTopK(base, Seq("g"), "v", k = 2)
    val d1 = Seq(("a", 10.0, -1L), ("a", 1.0, 1L)).toDF("g", "v", "sign")
    val st1 = ViewMaintenance.retractTopK(st0, d1, Seq("g"), "v", "sign", k = 2)
    assert(topkOf(st1, "a") === Seq(9.0, 1.0))
    assert(!st1.filter(col("g") === "a").head().getAs[Boolean]("needs_rebuild"),
      "head 9 >= fence 8: still provable")
    val d2 = Seq(("a", 9.0, -1L)).toDF("g", "v", "sign")
    val st2 = ViewMaintenance.retractTopK(st1, d2, Seq("g"), "v", "sign", k = 2)
    assert(st2.filter(col("g") === "a").head().getAs[Boolean]("needs_rebuild"),
      "head 1 < fence 8: the true max may be among truncated values")
    assert(!st2.filter(col("g") === "b").head().getAs[Boolean]("needs_rebuild"),
      "untouched groups must not be flagged")
    // repair consults the base for ONLY the flagged group and is exact
    val live = Seq(("a", 8.0), ("a", 1.0), ("b", 5.0)).toDF("g", "v")
    val ans = ViewMaintenance.repairExtremum(st2, live, Seq("g"), "v", "mx")
    assert(ans.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap ===
      Map("a" -> 8.0, "b" -> 5.0))
  }

  test("retractTopK: emptied buffer with live rows flags; emptied group drops") {
    val base = Seq(("a", 2.0), ("a", 1.0), ("c", 4.0)).toDF("g", "v")
    val st0 = ViewMaintenance.rebuildTopK(base, Seq("g"), "v", k = 1)
    // delete a's buffered max AND c's only row
    val d = Seq(("a", 2.0, -1L), ("c", 4.0, -1L)).toDF("g", "v", "sign")
    val st1 = ViewMaintenance.retractTopK(st0, d, Seq("g"), "v", "sign", k = 1)
    assert(st1.filter(col("g") === "a").head().getAs[Boolean]("needs_rebuild"),
      "cnt>0 with an empty buffer cannot answer")
    assert(st1.filter(col("g") === "c").count() === 0L,
      "a fully-deleted group leaves the view")
  }

  test("retractTopK: mixed multiset churn equals recompute over survivors") {
    val base = rows(300).toDF("g", "id", "v", "m").select(col("g"), col("v"))
    val st0 = ViewMaintenance.rebuildTopK(base, Seq("g"), "v", k = 4)
    // delete every v divisible by 3 (one copy each — they are unique),
    // insert a few new highs and lows
    val dels = base.filter(col("v") % 3 === 0)
      .select(col("g"), col("v"), lit(-1L).as("sign"))
    val ins = Seq(("g1", 9999.0, 1L), ("g2", 0.5, 1L), ("g1", 9998.0, 1L))
      .toDF("g", "v", "sign")
    val st1 = ViewMaintenance.retractTopK(
      st0, dels.unionByName(ins), Seq("g"), "v", "sign", k = 4)
    val live = base.filter(!(col("v") % 3 === 0))
      .unionByName(ins.select(col("g"), col("v")))
    val got = ViewMaintenance.repairExtremum(st1, live, Seq("g"), "v", "mx")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = live.groupBy("g").agg(max("v").as("mx"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got === want)
  }
}
