package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The `#rows` manifest layer and `#op` commit classification: exact
  * per-directory row/byte counts gathered once from parquet footers at
  * publish time and carried forward verbatim (immutable directories ⟹
  * immutable counts), and every commit path naming its operation in the
  * manifest. These are the foundations for metadata-only `count(*)`,
  * exact CBO statistics, and the row-level change feed.
  */
class VersionedLakeStatsSpec extends SparkSpec {

  test("every commit records exact per-directory row and byte counts") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("vlake_rows").toString
    VersionedLake.appendCommit((1L to 100L).toDF("id"), dir)
    VersionedLake.appendCommit((101L to 130L).toDF("id"), dir)
    val counts = VersionedLake.dirRowCounts(s, dir, 1)
    val m = VersionedLake.manifest(s, dir, 1)
    assert(counts.keySet === m.toSet, "every directory must carry a rows line")
    assert(counts.values.map(_._1).toSeq.sorted === Seq(30L, 100L))
    assert(counts.values.forall(_._2 > 0L), "byte counts come from the file listing")
  }

  test("counts are carried forward, not recomputed: appended dirs keep their line verbatim") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("vlake_rows_carry").toString
    VersionedLake.appendCommit((1L to 50L).toDF("id"), dir)
    val before = VersionedLake.dirRowCounts(s, dir, 0)
    VersionedLake.appendCommit((51L to 60L).toDF("id"), dir)
    val after = VersionedLake.dirRowCounts(s, dir, 1)
    before.foreach { case (d, rc) =>
      assert(after(d) === rc, s"carried count for $d must be identical")
    }
    assert(after.size === before.size + 1)
  }

  test("row counts survive copy-on-write rewrites with correct recount for rewritten dirs") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("vlake_rows_cow").toString
    VersionedLake.appendCommit((1L to 100L).toDF("id"), dir, statsCols = Seq("id"))
    VersionedLake.appendCommit((101L to 200L).toDF("id"), dir, statsCols = Seq("id"))
    val v = VersionedLake.deleteWhere(s, dir, col("id") <= 10)
    val counts = VersionedLake.dirRowCounts(s, dir, v)
    assert(counts.values.map(_._1).sum === 190L,
      "totals must reflect the post-delete row count exactly")
    assert(counts.values.map(_._1).toSeq.sorted === Seq(90L, 100L),
      "the untouched dir keeps 100, the rewritten dir recounts to 90")
  }

  test("commit paths name their operation in the manifest") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("vlake_ops").toString
    VersionedLake.appendCommit((1L to 20L).toDF("id"), dir, statsCols = Seq("id"))
    assert(VersionedLake.commitOp(s, dir, 0) === Some("append"))
    VersionedLake.upsertMor(
      s, dir, Seq(5L, 21L).toDF("id"), keys = Seq("id"))
    assert(VersionedLake.commitOp(s, dir, 1) === Some("upsert_mor"))
    VersionedLake.materializeDeletes(s, dir)
    assert(VersionedLake.commitOp(s, dir, 2) === Some("materialize"))
    VersionedLake.optimize(s, dir)
    assert(VersionedLake.commitOp(s, dir, 3) === Some("optimize"))
    VersionedLake.deleteWhere(s, dir, col("id") > 20)
    assert(VersionedLake.commitOp(s, dir, 4) === Some("delete_where"))
    val snap = VersionedLake.rollback(s, dir, 3)
    assert(VersionedLake.commitOp(s, dir, snap) === Some("rollback"))
  }

  test("an optimize recounts the compacted directory to the snapshot total") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("vlake_rows_opt").toString
    VersionedLake.appendCommit((1L to 40L).toDF("id"), dir)
    VersionedLake.appendCommit((41L to 70L).toDF("id"), dir)
    val v = VersionedLake.optimize(s, dir)
    val counts = VersionedLake.dirRowCounts(s, dir, v)
    assert(counts.size === 1 && counts.values.head._1 === 70L)
  }
}
