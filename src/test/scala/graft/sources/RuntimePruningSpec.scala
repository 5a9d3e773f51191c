package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.LakePruningScanBuilder

/** Runtime directory pruning (dynamic file skipping): a broadcast join's
  * key set — known only at execution — re-prunes a stats-layered lake
  * table's manifest directories through [[SupportsRuntimeV2Filtering]],
  * so DPP works on ANY stats/bloom column, not just hive partitions.
  */
class RuntimePruningSpec extends SparkSpec {

  private lazy val root: String = {
    val r = java.nio.file.Files.createTempDirectory("graft_rtp").toString
    spark.conf.set("spark.sql.catalog.grtp", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.grtp.root", r)
    val fact = spark.range(0, 30000)
      .select(col("id").as("k"), (col("id") * 2.0).as("v"))
    val f = s"$r/fct"
    VersionedLake.appendCommit(fact.filter(col("k") < 10000), f, statsCols = Seq("k"))
    VersionedLake.appendCommit(
      fact.filter(col("k") >= 10000 && col("k") < 20000), f, statsCols = Seq("k"))
    VersionedLake.appendCommit(fact.filter(col("k") >= 20000), f, statsCols = Seq("k"))
    val dim = spark.range(25000, 25040)
      .select(col("id").as("dk"), lit("x").as("tag"))
    VersionedLake.appendCommit(dim, s"$r/dm")
    r
  }

  test("a broadcast join's key set re-prunes the manifest at execution") {
    root
    LakePruningScanBuilder.lastRuntimeKept.set(null)
    // the dim-side predicate is what makes the planner inject the
    // runtime filter (DPP's standard selectivity requirement)
    val q = spark.sql(
      """SELECT f.k, f.v FROM grtp.fct f
        |JOIN grtp.dm d ON f.k = d.dk WHERE d.tag = 'x'""".stripMargin)
    val rows = q.collect()
    assert(rows.length === 40)
    assert(rows.forall(r => r.getLong(0) >= 25000 && r.getLong(0) < 25040))
    val kept = Option(LakePruningScanBuilder.lastRuntimeKept.get)
    assert(kept.exists(_.size == 1),
      s"the 40-key build set lives entirely in the third range directory; got $kept")
    assert(q.queryExecution.executedPlan.toString.contains("GraftRuntimePruned"),
      "the fact scan must be the runtime-pruned wrapper")
  }

  test("a key set spanning every directory keeps them all (prune-only, never rows)") {
    root
    LakePruningScanBuilder.lastRuntimeKept.set(null)
    val wide = spark.range(0, 3)
      .select((col("id") * 10000 + 5).as("dk"), lit("y").as("tag"))
    VersionedLake.appendCommit(wide, s"$root/dmwide")
    val q = spark.sql(
      """SELECT f.k FROM grtp.fct f
        |JOIN grtp.dmwide d ON f.k = d.dk WHERE d.tag = 'y'""".stripMargin)
    assert(q.collect().map(_.getLong(0)).sorted.toSeq === Seq(5L, 10005L, 20005L))
    val kept = Option(LakePruningScanBuilder.lastRuntimeKept.get)
    assert(kept.forall(_.size == 3),
      s"keys in all three ranges must keep all three directories; got $kept")
  }

  test("tables without stats layers keep the stock scan (nothing to prune with)") {
    root
    val q = spark.sql(
      "SELECT d.dk FROM grtp.dm d JOIN grtp.fct f ON d.dk = f.k WHERE f.v > 0")
    assert(!q.queryExecution.executedPlan.toString
      .linesIterator.exists(l => l.contains("BatchScan dm") && l.contains("GraftRuntimePruned")),
      "the stats-less dim side must not claim runtime filterability")
    assert(q.collect().length === 40)
  }

  test("large IN sets prune via sorted binary search, identically to the exact path") {
    root
    val v = VersionedLake.currentVersion(spark, s"$root/fct").get
    // 100 keys confined to the middle range directory
    val big = (0 until 100).map(i => (12000 + i).asInstanceOf[Any]).toArray
    val keptBig = VersionedLake.pruneDirsForFilters(spark, s"$root/fct", v,
      Seq(org.apache.spark.sql.sources.In("k", big)))
    assert(keptBig.size === 1, s"100 mid-range keys prune to the middle dir: $keptBig")
    // the small-IN (exact) path agrees on the same band
    val keptSmall = VersionedLake.pruneDirsForFilters(spark, s"$root/fct", v,
      Seq(org.apache.spark.sql.sources.In("k", Array(12000, 12050))))
    assert(keptSmall === keptBig)
    // a big set spanning everything keeps everything
    val all = (0 until 100).map(i => (i * 300).asInstanceOf[Any]).toArray
    assert(VersionedLake.pruneDirsForFilters(spark, s"$root/fct", v,
      Seq(org.apache.spark.sql.sources.In("k", all))).size === 3)
  }
}
