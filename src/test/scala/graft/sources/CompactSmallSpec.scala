package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental compaction: only sub-threshold directories rewrite —
  * O(small dirs), not O(table) — and everything else (manifest lines,
  * stats, time travel, CDC neutrality, hive layout) carries verbatim.
  */
class CompactSmallSpec extends SparkSpec {

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft_csm").toString + "/t"

  test("consolidates only sub-threshold dirs; big dirs carry verbatim with their stats") {
    val t = freshDir()
    val df = (lo: Int, hi: Int) => spark.range(lo, hi)
      .select(col("id").as("k"), (col("id") * 1.0).as("v"))
    VersionedLake.appendCommit(df(0, 5000), t, statsCols = Seq("k"))     // big
    VersionedLake.appendCommit(df(5000, 5010), t, statsCols = Seq("k")) // small
    VersionedLake.appendCommit(df(5010, 5020), t, statsCols = Seq("k")) // small
    VersionedLake.appendCommit(df(5020, 10020), t, statsCols = Seq("k")) // big
    VersionedLake.appendCommit(df(10020, 10030), t, statsCols = Seq("k")) // small
    val before = VersionedLake.currentVersion(spark, t).get
    val bigDirs = VersionedLake.manifest(spark, t, before)
      .filter(d => VersionedLake.dirRowCounts(spark, t, before)(d)._1 >= 1000)

    val v = VersionedLake.compactSmall(spark, t, smallRows = 1000)
    assert(v.contains(before + 1))
    val dirs = VersionedLake.manifest(spark, t, v.get)
    assert(dirs.length === 3, s"2 big + 1 consolidated, got $dirs")
    assert(bigDirs.forall(dirs.contains), "big directories carry by name, unrewritten")
    // rows identical
    assert(VersionedLake.read(spark, t).count() === 10030)
    assert(VersionedLake.read(spark, t).agg(sum("k")).head().getLong(0) ===
      (0L until 10030).sum)
    // stats carried for big dirs AND recomputed for the consolidated one:
    // a point lookup outside the consolidated band prunes to one dir
    val keptForPoint = VersionedLake.pruneDirsForFilters(spark, t, v.get,
      Seq(org.apache.spark.sql.sources.EqualTo("k", 100)))
    assert(keptForPoint.size === 1, s"stats must survive compaction: $keptForPoint")
    // time travel: the pre-compaction version still reads all 5 dirs
    assert(VersionedLake.readVersion(spark, t, before).count() === 10030)
    // CDC: the compaction window is row-neutral
    assert(VersionedLake.readRowChanges(spark, t, before, v.get).isEmpty)
  }

  test("fewer than two small dirs is a no-op: no commit") {
    val t = freshDir()
    VersionedLake.appendCommit(spark.range(0, 5000).toDF("k"), t)
    VersionedLake.appendCommit(spark.range(5000, 5010).toDF("k"), t)
    val before = VersionedLake.currentVersion(spark, t).get
    assert(VersionedLake.compactSmall(spark, t, smallRows = 1000).isEmpty)
    assert(VersionedLake.currentVersion(spark, t).get === before)
  }

  test("zero-row directories sweep out with the small band") {
    val t = freshDir()
    VersionedLake.appendCommit(spark.range(0, 5000).toDF("k"), t)
    VersionedLake.appendCommit(spark.range(5000, 5010).toDF("k"), t)
    VersionedLake.truncate(spark, t): Unit // empty snapshot dir enters the manifest
    VersionedLake.appendCommit(spark.range(0, 20).toDF("k"), t)
    val v = VersionedLake.compactSmall(spark, t, smallRows = 1000)
    assert(v.isDefined)
    val rows = VersionedLake.dirRowCounts(spark, t, v.get)
    assert(rows.values.forall(_._1 > 0), s"no zero-row dir survives: $rows")
    assert(VersionedLake.read(spark, t).count() === 20)
  }

  test("partitioned tables consolidate under the declared hive layout") {
    val t = freshDir()
    val df = (lo: Int, hi: Int) => spark.range(lo, hi)
      .select((col("id") % 4).as("p"), col("id").as("k"))
    VersionedLake.appendCommit(df(0, 5000), t, parts = Seq("p"))
    VersionedLake.appendCommit(df(5000, 5010), t, parts = Seq("p"))
    VersionedLake.appendCommit(df(5010, 5020), t, parts = Seq("p"))
    val v = VersionedLake.compactSmall(spark, t, smallRows = 1000)
    assert(v.isDefined)
    val dirs = VersionedLake.manifest(spark, t, v.get)
    assert(dirs.length === 2)
    // the consolidated dir is REALLY hive-partitioned (not flat with p
    // as a data column): its recorded chain must say so
    dirs.foreach { d =>
      assert(VersionedLake.dirPartitionChain(spark, t, v.get, d) === Seq("p"),
        s"dir $d must lay out under the declared hive chain")
    }
    assert(VersionedLake.read(spark, t).filter(col("p") === 1).count() === 1255)
    assert(VersionedLake.read(spark, t).count() === 5020)
  }

  test("CALL system.optimize(small_rows => n) drives it by table name") {
    val r = java.nio.file.Files.createTempDirectory("graft_csmp").toString
    spark.conf.set("spark.sql.catalog.gcsm", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcsm.root", r)
    spark.sql("CREATE TABLE gcsm.t (k BIGINT)")
    spark.sql("INSERT INTO gcsm.t SELECT id FROM range(0, 5000)")
    spark.sql("INSERT INTO gcsm.t VALUES (9991), (9992)")
    spark.sql("INSERT INTO gcsm.t VALUES (9993)")
    val out = spark.sql("CALL gcsm.system.optimize('t', small_rows => 1000)")
    assert(out.columns.toSeq === Seq("version"))
    assert(VersionedLake.manifest(spark, s"$r/t",
      VersionedLake.currentVersion(spark, s"$r/t").get).length === 2)
    assert(spark.sql("SELECT count(*) FROM gcsm.t").head().getLong(0) === 5003)
    val e = intercept[Exception](
      spark.sql("CALL gcsm.system.optimize('t', zorder_by => 'k', small_rows => 10)"))
    assert(e.getMessage.contains("composes with neither"))
  }
}
