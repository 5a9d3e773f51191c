package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Metadata-only PARTITION-COLUMN rename: existing directories keep
  * rendering the former name in their `k=v` levels (verbatim per-dir
  * spec lines), new directories lay out under the new name, reads bind
  * the rendered level back to the logical column by bare alias — so
  * hive partition pruning by the NEW name survives on every spec — and
  * no data moves at any scale.
  */
class PartitionRenameSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("rename on a 3-spec table: zero rewrite, reads bind, pruning by the new name everywhere") {
    val s = spark
    import s.implicits._
    val dir = tmp("prn_lib")
    // spec 1: partitioned by the ORIGINAL name
    VersionedLake.appendCommit(
      Seq((1L, "d1", "a"), (2L, "d2", "b")).toDF("id", "day", "v"), dir,
      parts = Seq("day"))
    val dirsBefore = VersionedLake.manifest(s, dir, 0L)
    val v = VersionedLake.renameColumn(s, dir, "day", "dt")
    assert(v === 1L)
    assert(VersionedLake.manifest(s, dir, v) === dirsBefore,
      "the rename is one manifest commit - no data movement")
    // spec 2: a post-rename partitioned dir lays out under the NEW name
    VersionedLake.appendCommit(
      Seq((3L, "d1", "c")).toDF("id", "dt", "v"), dir, parts = Seq("dt"))
    // spec 3: a flat dir stores dt in FILES
    VersionedLake.appendCommit(
      Seq((4L, "d3", "d")).toDF("id", "dt", "v"), dir)
    val cur = VersionedLake.currentVersion(s, dir).get
    // the physical layouts really differ: old dir renders day=, new dt=
    val f = new java.io.File(s"$dir/data")
    val renders = f.listFiles().flatMap(_.listFiles())
      .map(_.getName.takeWhile(_ != '=')).filter(n => n == "day" || n == "dt").toSet
    assert(renders === Set("day", "dt"),
      s"pre-rename dirs must keep their rendered name: $renders")
    // reads bind every spec to the logical column
    val df = VersionedLake.readVersion(s, dir, cur)
    assert(df.columns.toSeq === Seq("id", "dt", "v"))
    assert(df.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "d1"), (2L, "d2"), (3L, "d1"), (4L, "d3")))
    // pruning by the NEW name reaches the old spec's partition level as
    // a real PartitionFilter (bare alias, not coalesce)
    val q = df.filter(col("dt") === "d1")
    assert(q.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(day") ||
      plan.contains("PartitionFilters: [(day"),
      s"the dt filter must prune the OLD spec's day= level:\n$plan")
    assert(plan.contains("PartitionFilters: [isnotnull(dt") ||
      plan.contains("PartitionFilters: [(dt"),
      s"and the NEW spec's dt= level:\n$plan")
  }

  test("catalog lifecycle: ALTER RENAME, INSERT lays out new-name, SHOW PARTITIONS translates") {
    val s = spark
    val root = tmp("prn_cat")
    s.conf.set("spark.sql.catalog.gprn", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.gprn.root", root)
    s.sql("CREATE TABLE gprn.t (id BIGINT, day STRING) PARTITIONED BY (day)")
    s.sql("INSERT INTO gprn.t VALUES (1, 'd1'), (2, 'd2')")
    s.sql("ALTER TABLE gprn.t RENAME COLUMN day TO dt")
    // post-rename INSERT must lay out under the NEW name (the carrier
    // prop and the physical fallback both translate)
    s.sql("INSERT INTO gprn.t VALUES (3, 'd3')")
    val renders = new java.io.File(s"$root/t/data").listFiles()
      .flatMap(_.listFiles())
      .map(_.getName.takeWhile(_ != '=')).filter(n => n == "day" || n == "dt").toSet
    assert(renders === Set("day", "dt"),
      s"old dirs keep day=, the new insert writes dt=: $renders")
    // SHOW PARTITIONS binds old renders to the logical name
    val parts = s.sql("SHOW PARTITIONS gprn.t").collect().map(_.getString(0)).sorted
    assert(parts.toSeq === Seq("dt=d1", "dt=d2", "dt=d3"),
      s"pre-rename partitions must list under the new name: ${parts.toSeq}")
    // reads + pruning by the new name through the catalog
    val q = s.sql("SELECT id FROM gprn.t WHERE dt = 'd1'")
    assert(q.collect().map(_.getLong(0)).toSeq === Seq(1L))
    // DROP PARTITION by the new name reaches an old-spec partition
    s.sql("ALTER TABLE gprn.t DROP PARTITION (dt = 'd2')")
    assert(s.sql("SELECT id FROM gprn.t ORDER BY id").collect()
      .map(_.getLong(0)).toSeq === Seq(1L, 3L))
  }
}
