package graft.plans

import graft.SparkSpec
import graft.operators.TopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** TopK.perKey (custom PartialTopK plan) must be row-identical to the
  * plain window formulation, actually prune before the exchange, and
  * plan through the injected strategy.
  */
class PartialTopKSpec extends SparkSpec {

  private def li = spark.read.parquet(s"$sf/lineitem.parquet")
    .withColumn("tie", col("l_orderkey") * 10 + col("l_linenumber"))

  private def windowed(desc: Boolean) = {
    val ord = if (desc) col("l_extendedprice").desc else col("l_extendedprice").asc
    li.withColumn(
        "rn",
        row_number().over(
          Window.partitionBy(col("l_suppkey")).orderBy(ord, col("tie").asc)))
      .filter(col("rn") <= 3)
  }

  test("identical to the window formulation (desc)") {
    val fast = TopK.perKey(li, Seq("l_suppkey"), "l_extendedprice", "tie", 3)
    val slow = windowed(desc = true)
    assert(fast.exceptAll(slow).count() === 0)
    assert(slow.exceptAll(fast).count() === 0)
  }

  test("identical to the window formulation (asc)") {
    val fast = TopK.perKey(
      li, Seq("l_suppkey"), "l_extendedprice", "tie", 3, descending = false)
    val slow = windowed(desc = false)
    assert(fast.exceptAll(slow).count() === 0)
    assert(slow.exceptAll(fast).count() === 0)
  }

  test("the physical plan contains PartialTopKExec and prunes the shuffle") {
    val src = li
    val fast = TopK.perKey(src, Seq("l_suppkey"), "l_extendedprice", "tie", 3)
    // SparkPlan.nodeName strips the Exec suffix in plan strings
    assert(fast.queryExecution.executedPlan.toString.contains("PartialTopK"))
    // pruned row count is bounded by k * keys * input partitions, far
    // below the table size
    val lp = Bridge.logicalPlan(src)
    def attr(n: String) = lp.output.find(_.name == n).get
    val pruned = Bridge.ofRows(
      spark,
      PartialTopK(
        Seq(attr("l_suppkey")), attr("l_extendedprice"), attr("tie"),
        descending = true, 3, lp))
    val total = li.count()
    val kept = pruned.count()
    assert(kept < total, s"pruning kept everything ($kept of $total)")
    val parts = li.rdd.getNumPartitions
    val nKeys = li.select("l_suppkey").distinct().count()
    assert(kept <= 3L * nKeys * parts)
  }

  test("null order values pass through and rank by the window's null rule") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, java.lang.Double.valueOf(5.0), 1L),
      (1L, null.asInstanceOf[java.lang.Double], 2L),
      (1L, java.lang.Double.valueOf(3.0), 3L),
      (2L, null.asInstanceOf[java.lang.Double], 4L),
      (2L, null.asInstanceOf[java.lang.Double], 5L)
    ).toDF("k", "v", "tie")
    val fast = TopK.perKey(df, Seq("k"), "v", "tie", 2)
    val slow = df.withColumn(
        "rn",
        row_number().over(
          Window.partitionBy(col("k")).orderBy(col("v").desc, col("tie").asc)))
      .filter(col("rn") <= 2)
    assert(fast.exceptAll(slow).count() === 0)
    assert(slow.exceptAll(fast).count() === 0)
  }

  test("ord ties at the retention boundary keep the SMALLEST ties (window parity)") {
    // every row shares ord — the window (ord desc, tie asc) ranks ties
    // 1..k first in BOTH directions; the heap once kept the largest ties
    // of an equal-ord group (same-direction tuple order), silently
    // returning the wrong rows despite a unique tie column
    val s = spark
    import s.implicits._
    val df = (1L to 5L).map(t => (1L, 1.0, t)).toDF("k", "v", "tie").repartition(1)
    for (desc <- Seq(true, false)) {
      val fast = TopK.perKey(df, Seq("k"), "v", "tie", 2, descending = desc)
        .select("tie").as[Long].collect().sorted.toSeq
      assert(fast === Seq(1L, 2L), s"descending=$desc kept wrong boundary ties: $fast")
    }
  }

  test("randomized window parity under heavy ord ties (seeded regression net)") {
    // tiny ord domain forces boundary ties in nearly every trial; any
    // divergence between the pruned plan and the pure window (the bug
    // class fixed above) surfaces here across directions, k, and
    // partitionings
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(4242)
    for (trial <- 1 to 8) {
      val data = Seq.tabulate(300)(i =>
        (rnd.nextInt(4).toLong, rnd.nextInt(5).toDouble, i.toLong))
      val df = data.toDF("k", "v", "tie").repartition(1 + rnd.nextInt(7))
      val desc = trial % 2 == 0
      val k = 1 + rnd.nextInt(4)
      val fast = TopK.perKey(df, Seq("k"), "v", "tie", k, descending = desc)
        .select("k", "v", "tie").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
      val ordCol = if (desc) col("v").desc else col("v").asc
      val slow = df.withColumn("rn", row_number().over(
          Window.partitionBy(col("k")).orderBy(ordCol, col("tie").asc)))
        .filter(col("rn") <= k).select("k", "v", "tie").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
      assert(fast === slow, s"trial $trial desc=$desc k=$k diverged")
    }
  }
}
