package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The versioned table's contract: atomic pointer publishes (partial
  * writes invisible), streaming upserts with no materialization barrier,
  * time travel until vacuum.
  */
class VersionedLakeSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    df.select("id", "payload").collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("commit/read round-trip; versions increment; time travel reads old snapshots") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("vlake").toString
    val v0 = VersionedLake.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "payload"), dir)
    assert(v0 === 0L)
    val v1 = VersionedLake.commit(Seq((1L, "a2"), (3L, "c")).toDF("id", "payload"), dir)
    assert(v1 === 1L)
    assert(rows(VersionedLake.read(s, dir)) === Set((1L, "a2"), (3L, "c")))
    assert(rows(VersionedLake.readVersion(s, dir, 0)) === Set((1L, "a"), (2L, "b")))
  }

  test("a crashed writer's unpublished files are invisible and never collide") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("vlake_crash").toString
    VersionedLake.commit(Seq((1L, "a")).toDF("id", "payload"), dir)
    // simulate a writer that died after writing data but before publish:
    // a full, valid, UNPUBLISHED version directory
    Seq((9L, "ghost")).toDF("id", "payload")
      .write.parquet(s"$dir/v=1")
    assert(rows(VersionedLake.read(s, dir)) === Set((1L, "a")),
      "readers must resolve the pointer, not the directory listing")
    // the next commit must allocate ABOVE the orphan, not collide with it
    val v = VersionedLake.commit(Seq((2L, "b")).toDF("id", "payload"), dir)
    assert(v === 2L)
    assert(rows(VersionedLake.read(s, dir)) === Set((2L, "b")))
  }

  test("upsert merges by key into a NEW version; the old snapshot survives") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("vlake_upsert").toString
    VersionedLake.commit(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "payload"), dir)
    val v = VersionedLake.upsert(
      s, dir, Seq((2L, "b2"), (4L, "d")).toDF("id", "payload"), keys = Seq("id"))
    assert(v === 1L)
    assert(rows(VersionedLake.read(s, dir)) ===
      Set((1L, "a"), (2L, "b2"), (3L, "c"), (4L, "d")))
    // snapshot isolation: version 0 is untouched by the rewrite
    assert(rows(VersionedLake.readVersion(s, dir, 0)) ===
      Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("vacuum drops only versions below the published one") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("vlake_vac").toString
    VersionedLake.commit(Seq((1L, "a")).toDF("id", "payload"), dir)
    VersionedLake.commit(Seq((1L, "a2")).toDF("id", "payload"), dir)
    VersionedLake.vacuum(s, dir)
    assert(rows(VersionedLake.read(s, dir)) === Set((1L, "a2")))
    assert(!new java.io.File(s"$dir/v=0").exists, "vacuumed version must be gone")
    intercept[Exception](VersionedLake.readVersion(s, dir, 0).collect())
  }

  test("partitioned commits keep directory pruning inside the version") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("vlake_parts").toString
    val df = Seq((1L, "a", "2024-01-01"), (2L, "b", "2024-01-02"))
      .toDF("id", "payload", "dt")
    VersionedLake.commit(df, dir, parts = Seq("dt"))
    val pruned = VersionedLake.read(s, dir).filter(col("dt") === "2024-01-01")
    assert(pruned.collect().map(_.getLong(0)).toSeq === Seq(1L))
    // numFiles counts files actually opened — the excluded partition's
    // file never is (inputFiles lists the pre-pruning relation)
    val scan = pruned.queryExecution.executedPlan
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .head
    assert(scan.metrics("numFiles").value === 1L,
      s"expected 1 file opened, saw ${scan.metrics("numFiles").value}")
  }
}
