package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PARTITION-SPEC EVOLUTION: new data lands under a new hive scheme
  * while old directories stay readable in place — the manifest records
  * each directory's spec, reads group per spec, and pruning applies
  * per-spec (partition pruning on hive dirs, parquet pushdown on flat).
  */
class PartitionEvolutionSpec extends SparkSpec {

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  test("flat table evolves to partitioned appends; manifest records per-dir specs") {
    val s = spark
    import s.implicits._
    val dir = tmp("pevo_f2p")
    VersionedLake.appendCommit(
      Seq((1L, "d1", "a"), (2L, "d2", "b")).toDF("id", "day", "v"), dir)
    // evolution: the next append lands hive-partitioned by day
    VersionedLake.appendCommit(
      Seq((3L, "d1", "c"), (4L, "d3", "d")).toDF("id", "day", "v"), dir,
      parts = Seq("day"))
    val cur = VersionedLake.currentVersion(s, dir).get
    val specs = VersionedLake.dirParts(s, dir, cur)
    val dirs = VersionedLake.manifest(s, dir, cur)
    assert(specs.get(dirs.last).contains(Seq("day")), "new dir records its spec")
    assert(!specs.contains(dirs.head), "the flat dir records none")
    assert(VersionedLake.hasMixedPartitionSpecs(s, dir, cur))
    assert(VersionedLake.partitionColumns(s, dir, cur) === Seq("day"),
      "the table's current spec is the newest directory's")
    val df = VersionedLake.read(s, dir)
    assert(df.count() === 4L)
    assert(df.filter(col("day") === "d1").orderBy("id").collect()
      .map(_.getLong(0)).toSeq === Seq(1L, 3L))
  }

  test("pruning applies PER SPEC: partition filters on hive dirs, pushdown on flat") {
    val s = spark
    import s.implicits._
    val dir = tmp("pevo_prune")
    VersionedLake.appendCommit(
      (0L until 50L).map(i => (i, s"d${i % 5}", s"v$i")).toDF("id", "day", "v"), dir)
    VersionedLake.appendCommit(
      (50L until 100L).map(i => (i, s"d${i % 5}", s"v$i")).toDF("id", "day", "v"), dir,
      parts = Seq("day"))
    val q = VersionedLake.read(s, dir).filter(col("day") === "d3")
    assert(q.count() === 20L)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(day") ||
      plan.contains("PartitionFilters: [(day"),
      s"the hive child must prune partitions, plan was:\n$plan")
    assert(plan.contains("EqualTo(day,d3)"),
      s"the flat child must push the filter to parquet, plan was:\n$plan")
  }

  test("catalog reads of an evolved table splice the per-spec union; INSERT follows the new spec") {
    val s = spark
    import s.implicits._
    val root = tmp("pevo_cat")
    spark.conf.set("spark.sql.catalog.gpev", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gpev.root", root)
    val dir = s"$root/evo"
    VersionedLake.appendCommit(
      Seq((1L, "d1", "a"), (2L, "d2", "b")).toDF("id", "day", "v"), dir)
    VersionedLake.appendCommit(
      Seq((3L, "d1", "c")).toDF("id", "day", "v"), dir, parts = Seq("day"))
    val got = spark.sql("SELECT id FROM gpev.evo WHERE day = 'd1' ORDER BY id")
      .collect().map(_.getLong(0))
    assert(got.toSeq === Seq(1L, 3L))
    // catalog INSERT keeps layout-aligned with the CURRENT (newest) spec
    spark.sql("INSERT INTO gpev.evo VALUES (9, 'd9', 'z')")
    val cur = VersionedLake.currentVersion(s, dir).get
    val dirs = VersionedLake.manifest(s, dir, cur)
    assert(VersionedLake.dirParts(s, dir, cur).get(dirs.last).contains(Seq("day")),
      "the INSERT's directory must follow the evolved spec")
    assert(spark.sql("SELECT count(*) FROM gpev.evo").head().getLong(0) === 4L)
  }

  test("row-level deleteWhere preserves each rewritten directory's own spec") {
    val s = spark
    import s.implicits._
    val dir = tmp("pevo_del")
    VersionedLake.appendCommit(
      Seq((1L, "d1", "a"), (2L, "d2", "b")).toDF("id", "day", "v"), dir)
    VersionedLake.appendCommit(
      Seq((3L, "d1", "c"), (4L, "d2", "d")).toDF("id", "day", "v"), dir,
      parts = Seq("day"))
    VersionedLake.deleteWhere(s, dir, col("id").isin(2L, 4L))
    val cur = VersionedLake.currentVersion(s, dir).get
    val df = VersionedLake.read(s, dir)
    assert(df.orderBy("id").collect().map(_.getLong(0)).toSeq === Seq(1L, 3L))
    // the rewritten partitioned directory is still partitioned (and its
    // manifest line says so)
    val specs = VersionedLake.dirParts(s, dir, cur)
    val dirs = VersionedLake.manifest(s, dir, cur)
    assert(dirs.exists(d => specs.get(d).contains(Seq("day"))),
      "a rewritten hive directory keeps its own layout")
  }
}
