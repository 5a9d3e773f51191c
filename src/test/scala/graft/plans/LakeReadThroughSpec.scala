package graft.plans

import graft.SparkSpec
import graft.sources.{GraftCatalog, VersionedLake}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions._

/** Plan-quality pins for [[LakeReadThroughRule]]: a catalog read that
  * needs library read-through (pending MoR deletes / rename indirection)
  * must plan as SPLICED file-source relations — real statistics for join
  * planning and runtime (dynamic partition pruning) filters — not as the
  * stats-blind `V1Scan` bridge. The bridge remains only for positions
  * the rule deliberately skips (DML targets), pinned here too.
  */
class LakeReadThroughSpec extends SparkSpec {

  private lazy val root: String = {
    val r = java.nio.file.Files.createTempDirectory("graft_rt").toString
    spark.conf.set("spark.sql.catalog.grt", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.grt.root", r)
    r
  }

  test("MoR-pending read splices: no V2 relation survives, stats are real") {
    val s = spark
    import s.implicits._
    root
    val dir = s"$root/fact"
    VersionedLake.appendCommit(
      (0L until 1000L).map(i => (i, i % 10, s"v$i")).toDF("id", "k", "v"), dir)
    VersionedLake.deleteKeysMor(spark, dir, Seq(7L, 8L).toDF("id"), Seq("id"))
    val df = spark.sql("SELECT id, k, v FROM grt.fact")
    // spliced: the analyzed plan carries the library read, not the relation
    assert(df.queryExecution.analyzed.collectFirst {
      case r: DataSourceV2Relation => r
    }.isEmpty, "MoR-pending relation must be spliced out at analysis")
    // statistics: the optimizer sees byte-exact file sizes, not the
    // unknown-size default that made the bridged side unbroadcastable
    val size = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val dflt = BigInt(spark.sessionState.conf.defaultSizeInBytes)
    assert(size > 0 && size < dflt / 1000,
      s"spliced MoR read must carry real stats, got $size (default $dflt)")
    // and the read is still correct: pending deletes applied
    assert(df.count() === 998L)
    assert(df.filter(col("id") === 7L).count() === 0L)
  }

  test("MoR-pending fact auto-broadcasts under a join (the bridge never did)") {
    root
    val dim = spark.range(10).select(col("id").as("k"), lit("d").as("tag"))
    val q = dim.join(spark.sql("SELECT k, v FROM grt.fact"), Seq("k"))
    val ex = q.queryExecution.executedPlan.toString
    assert(ex.contains("BroadcastHashJoin") || ex.contains("BroadcastExchange"),
      s"a ~40 KB spliced fact side should broadcast, plan was:\n$ex")
  }

  test("renamed-column read splices and keeps runtime-filter-capable scans") {
    val s = spark
    import s.implicits._
    root
    val dir = s"$root/renamed"
    VersionedLake.appendCommit(
      (0L until 100L).map(i => (i, s"n$i")).toDF("id", "old_name"), dir,
      parts = Seq.empty)
    VersionedLake.renameColumn(spark, dir, "old_name", "new_name")
    val df = spark.sql("SELECT id, new_name FROM grt.renamed WHERE id < 5")
    assert(df.queryExecution.analyzed.collectFirst {
      case r: DataSourceV2Relation => r
    }.isEmpty, "rename-indirection relation must be spliced out at analysis")
    assert(df.collect().map(_.getString(1)).sorted === (0 until 5).map(i => s"n$i"))
    // the filter reaches the inner parquet scan through the coalescing
    // projection — the declarative-plan dividend the bridge could not pay
    val ex = df.queryExecution.executedPlan.toString
    assert(ex.contains("PushedFilters") && ex.contains("LessThan(id,5"),
      s"id predicate must reach the spliced parquet scan, plan was:\n$ex")
  }

  test("dynamic partition pruning reaches a spliced hive-partitioned read") {
    val s = spark
    import s.implicits._
    root
    val dir = s"$root/pfact"
    VersionedLake.commit(
      (0L until 1000L).map(i => (i, i % 10, s"v$i")).toDF("id", "part_k", "v"),
      dir, parts = Seq("part_k"))
    // rename a DATA column: the table needs read-through but partition
    // directories stay intact for pruning
    VersionedLake.renameColumn(spark, dir, "v", "val")
    // the dim filter is on a NON-join column, so the surviving partition
    // keys are not statically derivable — only a runtime (dynamic
    // partition pruning) filter can prune the fact side. (A literal
    // filter on part_k itself pruned STATICALLY through the spliced
    // join, which is strictly better — verified while writing this pin.)
    val dim = spark.range(10)
      .select(col("id").as("part_k"), concat(lit("t"), col("id")).as("tag"))
    val q = dim.filter(col("tag") === "t3")
      .join(spark.sql("SELECT id, part_k, val FROM grt.pfact"), Seq("part_k"))
    assert(q.count() === 100L)
    val ex = q.queryExecution.executedPlan.toString
    assert(ex.contains("dynamicpruning"),
      s"partition-column join must carry a dynamic pruning filter, plan was:\n$ex")
  }

  test("DML targets are NOT spliced: UPDATE/MERGE still match the relation") {
    val s = spark
    import s.implicits._
    root
    val dir = s"$root/dmlt"
    VersionedLake.appendCommit(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    VersionedLake.renameColumn(spark, dir, "v", "w")
    // read-through applies to this table, but the DML target must stay a
    // relation for LakeDmlRules — a spliced target would make UPDATE fail
    spark.sql("UPDATE grt.dmlt SET w = 'z' WHERE id = 1")
    assert(spark.sql("SELECT w FROM grt.dmlt WHERE id = 1").collect()
      .map(_.getString(0)).toSeq === Seq("z"))
  }

  test("subquery expressions splice too: EXISTS over a MoR table plans file scans") {
    val s = spark
    import s.implicits._
    root
    val dir = s"$root/subf"
    VersionedLake.appendCommit(
      (0L until 100L).map(i => (i, s"v$i")).toDF("id", "v"), dir)
    VersionedLake.deleteKeysMor(spark, dir, Seq(5L).toDF("id"), Seq("id"))
    spark.range(10).select(col("id")).createOrReplaceTempView("rt_probe")
    val q = spark.sql(
      """SELECT id FROM rt_probe p
        |WHERE EXISTS (SELECT 1 FROM grt.subf f WHERE f.id = p.id)""".stripMargin)
    // the subquery's lake relation must be spliced out at analysis, like
    // a top-level read — previously it stayed on the V1 bridge and
    // planned a stats-blind RowDataSourceScanExec
    val survivors = q.queryExecution.analyzed.collect {
      case pl => pl.expressions.flatMap(_.collect {
        case se: org.apache.spark.sql.catalyst.expressions.SubqueryExpression =>
          se.plan.collectFirst { case r: DataSourceV2Relation => r }
      }.flatten)
    }.flatten
    assert(survivors.isEmpty,
      "the EXISTS subquery's MoR relation must be spliced at analysis")
    assert(!q.queryExecution.executedPlan.toString.contains("RowDataSourceScanExec"))
    // correctness: the pending delete applies inside the subquery
    assert(q.collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(0L, 1L, 2L, 3L, 4L, 6L, 7L, 8L, 9L))
    // scalar subquery splices too
    val sc = spark.sql("SELECT (SELECT count(*) FROM grt.subf) AS n")
    assert(sc.head().getLong(0) === 99L)
    assert(sc.queryExecution.analyzed.collect {
      case pl => pl.expressions.flatMap(_.collect {
        case se: org.apache.spark.sql.catalyst.expressions.SubqueryExpression =>
          se.plan.collectFirst { case r: DataSourceV2Relation => r }
      }.flatten)
    }.flatten.isEmpty, "scalar subqueries splice like any read")
  }
}
