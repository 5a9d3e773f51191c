package graft.queries

import graft.SparkSpec
import graft.SparkEntry
import org.apache.spark.sql.functions._

/** The CMS-as-aggregate-state contract behind `q_cms_freq`: a sketch whose
  * cells are rows is (a) a sound frequency estimator — min over hash rows
  * of bucket sums can never undercount — and (b) mergeable by plain
  * elementwise addition, which is what lets a CMS view maintain itself
  * incrementally from delta batches (the ViewMaintenance shape) with a
  * shuffle that carries d*w cells instead of the key dictionary.
  */
class CmsFreqSpec extends SparkSpec {

  override def sf: String = "/root/testdata/sf0.001"

  test("CMS estimates never underestimate; collision-free keys are exact") {
    val s = spark
    val est = SparkEntry.queries("q_cms_freq")(s, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = graft.engine.Session.table(s, sf, "lineitem")
      .groupBy("l_suppkey").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est.keySet === exact.keySet, "every supplier must be probed")
    exact.foreach { case (k, n) =>
      assert(est(k) >= n, s"CMS underestimated key $k: ${est(k)} < $n")
    }
    // 10 keys into 64 buckets: at least one supplier must be collision-free
    // in some hash row, where the estimate is exactly the true count
    assert(exact.exists { case (k, n) => est(k) == n },
      "no key estimated exactly — hash family degenerate?")
  }

  test("sketch state merges by elementwise SUM (delta-maintainable)") {
    val s = spark
    val li = graft.engine.Session.table(s, sf, "lineitem")
    val MersenneP = 2147483647L
    val W = 64
    val hashes = Seq((0, 911382323L, 1L), (1, 972663749L, 7L), (2, 123456791L, 13L))
    def cells(df: org.apache.spark.sql.DataFrame) = df
      .select(explode(array(hashes.map { case (i, a, b) =>
        struct(lit(i).as("i"),
          ((lit(a) * col("l_suppkey") + lit(b)) % MersenneP % W).as("bkt"))
      }: _*)).as("c"))
      .groupBy(col("c.i").as("i"), col("c.bkt").as("bkt"))
      .agg(count(lit(1)).as("cnt"))
    val whole = cells(li)
    val partA = cells(li.filter(col("l_orderkey") % 2 === 0))
    val partB = cells(li.filter(col("l_orderkey") % 2 =!= 0))
    val merged = partA.unionByName(partB)
      .groupBy("i", "bkt").agg(sum("cnt").as("cnt"))
    val lhs = whole.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val rhs = merged.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(lhs === rhs, "union sketch must equal elementwise sum of part sketches")
  }

  test("a CMS view maintains incrementally: per-delta cells fold by merge") {
    val s = spark
    val li = graft.engine.Session.table(s, sf, "lineitem")
    val MersenneP = 2147483647L
    val W = 64
    val hashes = Seq((0, 911382323L, 1L), (1, 972663749L, 7L), (2, 123456791L, 13L))
    def cells(df: org.apache.spark.sql.DataFrame) = df
      .select(explode(array(hashes.map { case (i, a, b) =>
        struct(lit(i).as("i"),
          ((lit(a) * col("l_suppkey") + lit(b)) % MersenneP % W).as("bkt"))
      }: _*)).as("c"))
      .groupBy(col("c.i").as("i"), col("c.bkt").as("bkt"))
      .agg(count(lit(1)).cast("long").as("cnt"))
    // three ingest batches, each folded into the standing view as it
    // arrives — the sketch IS distributive state, so the generic
    // maintenance operator carries it with no CMS-specific code
    val batches = (0 until 3).map(k => cells(li.filter(col("l_orderkey") % 3 === k)))
    val maintained = batches.reduce { (state, delta) =>
      graft.operators.ViewMaintenance.merge(
        Seq(state, delta), Seq("i", "bkt"), Seq("cnt" -> "sum"))
    }
    val direct = cells(li)
    val lhs = maintained.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val rhs = direct.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(lhs === rhs, "maintained CMS view must equal the direct sketch")
  }

  test("the cells shuffle carries the sketch, not the key dictionary") {
    val s = spark
    val df = SparkEntry.queries("q_cms_freq")(s, sf)
    df.collect()
    // d*w = 192 cells bound the aggregation state regardless of corpus
    // size; the post-agg frame must be broadcast (no probe-side shuffle)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "probe must broadcast the tiny cell frame")
  }
}
