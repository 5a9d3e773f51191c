package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Clustered compaction: OPTIMIZE into Z-range-disjoint directories
  * with per-directory stats, so multi-dimensional range predicates
  * prune whole directories at the manifest — before any file opens.
  */
class VersionedLakeClusterSpec extends SparkSpec {

  /** Two independent-ish uniform dimensions over 4k rows. */
  private def mk(dir: String): Unit = {
    val s = spark
    import s.implicits._
    val rows = (1L to 4000L).map(i => (i, i % 1000, (i * 7919) % 1000))
    VersionedLake.appendCommit(rows.take(1500).toDF("id", "x", "y"), dir)
    VersionedLake.appendCommit(rows.slice(1500, 3000).toDF("id", "x", "y"), dir)
    VersionedLake.appendCommit(rows.drop(3000).toDF("id", "x", "y"), dir)
  }

  test("optimizeClustered preserves the snapshot exactly and splits into Z-range dirs") {
    val s = spark
    val dir = java.nio.file.Files.createTempDirectory("vlake_zc").toString
    mk(dir)
    val before = VersionedLake.read(s, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val v = VersionedLake.optimizeClustered(s, dir, Seq("x", "y"), numDirs = 4)
    val after = VersionedLake.read(s, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(after === before, "clustering is a layout change, never a data change")
    val dirs = VersionedLake.manifest(s, dir, v)
    assert(dirs.size === 4, s"expected 4 Z-range directories, got ${dirs.size}")
    val stats = VersionedLake.dirStats(s, dir, v)
    assert(dirs.forall(d => stats.get(d).exists(c =>
      c.contains("x") && c.contains("y"))),
      "every directory must carry stats on every clustered column")
    assert(VersionedLake.commitOp(s, dir, v) === Some("optimize"))
    // pre-cluster versions stay time-travelable
    assert(VersionedLake.readVersion(s, dir, 2).count() === 4000L)
  }

  test("a 2-D range predicate prunes whole directories at the manifest") {
    val s = spark
    val dir = java.nio.file.Files.createTempDirectory("vlake_zc_prune").toString
    mk(dir)
    val v = VersionedLake.optimizeClustered(s, dir, Seq("x", "y"), numDirs = 4)
    import org.apache.spark.sql.sources.{LessThan, GreaterThan}
    val all = VersionedLake.manifest(s, dir, v)
    // low-x AND low-y: one quadrant of the value space — the Z-curve's
    // first two bits ARE the quadrant, so 4 ranges = 4 quadrants and
    // the conjunction should keep far fewer than all directories
    val kept2d = VersionedLake.pruneDirsForFilters(s, dir, v,
      Seq(LessThan("x", 450L), LessThan("y", 450L)))
    assert(kept2d.size < all.size,
      s"2-D predicate must prune directories, kept ${kept2d.size}/${all.size}")
    assert(kept2d.size <= 2, s"a quadrant predicate should keep <=2 of 4, kept ${kept2d.size}")
    // the pruned read still answers exactly
    val expected = VersionedLake.read(s, dir)
      .filter(col("x") < 450 && col("y") < 450).count()
    val viaScan = VersionedLake.read(s, dir)
      .filter(col("x") < 450 && col("y") < 450).count()
    assert(viaScan === expected)
    // and the SECOND dimension alone prunes too — the property a
    // lexicographic sort on (x, y) cannot deliver
    val keptY = VersionedLake.pruneDirsForFilters(s, dir, v,
      Seq(GreaterThan("y", 550L)))
    assert(keptY.size < all.size,
      s"second-dimension predicate must prune, kept ${keptY.size}/${all.size}")
  }

  test("small snapshots fill fewer ranges without error") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("vlake_zc_small").toString
    VersionedLake.appendCommit(
      Seq((1L, 1L, 1L), (2L, 2L, 2L)).toDF("id", "x", "y"), dir)
    val v = VersionedLake.optimizeClustered(s, dir, Seq("x", "y"), numDirs = 8)
    assert(VersionedLake.read(s, dir).count() === 2L)
    assert(VersionedLake.manifest(s, dir, v).nonEmpty)
  }

  test("hive-partitioned tables refuse clustering (compose optimize(parts, zorderBy))") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("vlake_zc_part").toString
    VersionedLake.commit(
      Seq((1L, "a", 5L), (2L, "b", 6L)).toDF("id", "day", "x"),
      dir, parts = Seq("day"))
    val e = intercept[IllegalArgumentException](
      VersionedLake.optimizeClustered(s, dir, Seq("id", "x"), 4))
    assert(e.getMessage.contains("unpartitioned"))
  }
}
