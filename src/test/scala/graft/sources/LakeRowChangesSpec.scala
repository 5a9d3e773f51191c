package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The row-level CDC change feed: exact insert/delete/update_pre/post
  * events reconstructed from the commit log's manifest diffs — O(delta)
  * for appends, O(delta + scoped dirs) for merge-on-read mutations,
  * nothing for layout-only rewrites, loud refusal for copy-on-write
  * rewrites. The load-bearing pin: replaying the feed over the starting
  * snapshot reproduces the ending snapshot exactly.
  */
class LakeRowChangesSpec extends SparkSpec {

  private def changes(dir: String, from: Long, to: Long) =
    VersionedLake.readRowChanges(spark, dir, from, to)
      .select("id", "v", "_change_type", "_commit_version")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet

  test("appends emit inserts tagged with their commit version") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cdc_append").toString
    VersionedLake.appendCommit(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    VersionedLake.appendCommit(Seq((3L, "c")).toDF("id", "v"), dir)
    assert(changes(dir, -1, 1) === Set(
      (1L, "a", "insert", 0L), (2L, "b", "insert", 0L), (3L, "c", "insert", 1L)))
    assert(changes(dir, 0, 1) === Set((3L, "c", "insert", 1L)),
      "a window starting after v0 excludes v0's rows")
  }

  test("upsertMor emits update_preimage/update_postimage for matched keys, insert for new") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cdc_upsert").toString
    VersionedLake.appendCommit(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    VersionedLake.upsertMor(s, dir,
      Seq((2L, "b2"), (9L, "new")).toDF("id", "v"), keys = Seq("id"))
    assert(changes(dir, 0, 1) === Set(
      (2L, "b", "update_preimage", 1L),
      (2L, "b2", "update_postimage", 1L),
      (9L, "new", "insert", 1L)))
  }

  test("deleteKeysMor emits exact delete pre-images") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cdc_del").toString
    VersionedLake.appendCommit(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), dir)
    VersionedLake.deleteKeysMor(s, dir, Seq(2L).toDF("id"), Seq("id"))
    assert(changes(dir, 0, 1) === Set((2L, "b", "delete", 1L)))
  }

  test("a key already MoR-deleted does not re-delete; re-inserted keys insert again") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cdc_redel").toString
    VersionedLake.appendCommit(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    VersionedLake.deleteKeysMor(s, dir, Seq(2L).toDF("id"), Seq("id"))
    // second delete of the same key: pre-image is already gone → no event
    VersionedLake.deleteKeysMor(s, dir, Seq(2L).toDF("id"), Seq("id"))
    VersionedLake.appendCommit(Seq((2L, "b-back")).toDF("id", "v"), dir)
    assert(changes(dir, 0, 3) === Set(
      (2L, "b", "delete", 1L), (2L, "b-back", "insert", 3L)))
  }

  test("optimize and materializeDeletes versions emit nothing; the feed spans them") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cdc_opt").toString
    VersionedLake.appendCommit(Seq((1L, "a")).toDF("id", "v"), dir)
    VersionedLake.deleteKeysMor(s, dir, Seq(1L).toDF("id"), Seq("id"))
    VersionedLake.materializeDeletes(s, dir)
    VersionedLake.optimize(s, dir)
    VersionedLake.appendCommit(Seq((5L, "e")).toDF("id", "v"), dir)
    assert(changes(dir, 0, 4) === Set(
      (1L, "a", "delete", 1L), (5L, "e", "insert", 4L)))
  }

  test("an analyze (stats backfill) version emits nothing; the feed spans it") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cdc_analyze").toString
    VersionedLake.appendCommit(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir,
      statsCols = Seq("id"))
    // metadata-only commit: op = "analyze", no added dirs, no change
    // artifact — it must classify as NoDelta, NOT as an unclassifiable
    // rewrite (which would wedge every CDC consumer — replication,
    // streaming readChanges, $changes — on a window spanning it, after a
    // maintenance call that changed ZERO rows)
    VersionedLake.analyzeStats(s, dir, Seq("v"))
    VersionedLake.appendCommit(Seq((3L, "c")).toDF("id", "v"), dir)
    assert(changes(dir, 0, 2) === Set((3L, "c", "insert", 2L)),
      "the window spanning the analyze version must serve, emitting only the append")
  }

  test("copy-on-write deleteWhere serves the feed from its change artifact") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cdc_cow").toString
    VersionedLake.appendCommit(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    VersionedLake.deleteWhere(s, dir, col("id") === 1L)
    assert(changes(dir, 0, 1) === Set((1L, "a", "delete", 1L)),
      "the commit-time artifact holds the deleted pre-images")
  }

  test("copy-on-write upsert emits update pre/post for matched keys, insert for new") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cdc_cow_ups").toString
    VersionedLake.appendCommit(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    VersionedLake.upsert(s, dir,
      Seq((2L, "b2"), (9L, "new")).toDF("id", "v"), keys = Seq("id"))
    assert(changes(dir, 0, 1) === Set(
      (2L, "b", "update_preimage", 1L),
      (2L, "b2", "update_postimage", 1L),
      (9L, "new", "insert", 1L)),
      "CoW upsert must emit the same event set its MoR twin does")
  }

  test("updateWhere emits pre/post images; a no-match CoW commit emits nothing") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cdc_cow_upd").toString
    VersionedLake.appendCommit(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    VersionedLake.updateWhere(s, dir, col("id") === 2L,
      Map("v" -> concat(col("v"), lit("!"))))
    assert(changes(dir, 0, 1) === Set(
      (2L, "b", "update_preimage", 1L),
      (2L, "b!", "update_postimage", 1L)))
    // no-match commit: artifact present (distinguishes from legacy), empty
    VersionedLake.deleteWhere(s, dir, col("id") === 777L)
    assert(changes(dir, 1, 2) === Set.empty,
      "a no-match copy-on-write commit is an empty window, not a refusal")
  }

  test("rewrites without a change artifact (rollback) refuse loudly") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cdc_rb").toString
    VersionedLake.appendCommit(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    VersionedLake.appendCommit(Seq((3L, "c")).toDF("id", "v"), dir)
    VersionedLake.rollback(s, dir, 0)
    val e = intercept[IllegalStateException](changes(dir, 1, 2))
    assert(e.getMessage.contains("diff snapshots"),
      "the refusal must direct users to a snapshot diff")
    // the refusal is the DEDICATED type fallback sites catch — an
    // unrelated IllegalStateException must never reroute a maintenance
    // sync onto the lossier manifest-diff path
    assert(e.isInstanceOf[VersionedLake.CdcWindowRefusedException],
      s"refusal must be CdcWindowRefusedException, was ${e.getClass.getName}")
  }

  test("replaying the feed over the starting snapshot reproduces the ending snapshot") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cdc_replay").toString
    VersionedLake.appendCommit(
      (1L to 40L).map(i => (i, s"v$i")).toDF("id", "v"), dir)
    VersionedLake.upsertMor(s, dir,
      (30L to 50L).map(i => (i, s"u$i")).toDF("id", "v"), keys = Seq("id"))
    VersionedLake.deleteKeysMor(s, dir, (1L to 10L).toDF("id"), Seq("id"))
    VersionedLake.appendCommit(Seq((99L, "tail")).toDF("id", "v"), dir)
    // copy-on-write mutations follow the MoR ones (after the fold the
    // CoW paths require): the feed must replay seamlessly across MoR
    // reconstruction, a silent materialize, and CoW artifacts
    VersionedLake.materializeDeletes(s, dir)
    VersionedLake.upsert(s, dir,
      (48L to 55L).map(i => (i, s"c$i")).toDF("id", "v"), keys = Seq("id"))
    VersionedLake.deleteWhere(s, dir, col("id") === 15L)
    val from = VersionedLake.readVersion(s, dir, 0)
    val feed = VersionedLake.readRowChanges(s, dir, 0, 6)
    // apply: add (insert + update_postimage), then cancel (delete +
    // update_preimage) against the ACCUMULATED multiset — a pre-image of
    // a row that was itself inserted inside the window must cancel that
    // insert, so the except runs after the union
    val removed = feed.filter(col("_change_type").isin("delete", "update_preimage"))
      .select("id", "v")
    val added = feed.filter(col("_change_type").isin("insert", "update_postimage"))
      .select("id", "v")
    val replayed = from.unionAll(added).exceptAll(removed)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val target = VersionedLake.read(s, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(replayed === target, "feed replay must reproduce the ending snapshot")
  }

  test("schema evolution inside the window null-fills by name at toVersion's schema") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cdc_evo").toString
    VersionedLake.appendCommit(Seq((1L, "a")).toDF("id", "v"), dir)
    VersionedLake.appendCommit(Seq((2L, "b", 7.5)).toDF("id", "v", "score"), dir)
    val got = VersionedLake.readRowChanges(s, dir, -1, 1)
    assert(got.columns.toSeq === Seq("id", "v", "score", "_change_type", "_commit_version"))
    val byId = got.collect().map(r => r.getLong(0) -> r.isNullAt(2)).toMap
    assert(byId(1L) === true && byId(2L) === false,
      "pre-evolution rows carry null in the added column")
  }

  test("a many-CoW-commit window plans ONE artifact scan, not a per-version union") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cdc_flat").toString
    VersionedLake.appendCommit(
      (0L until 40L).map(i => (i, s"v$i")).toDF("id", "v"), dir)
    // 12 copy-on-write upserts: each publishes a change artifact
    (0 until 12).foreach { i =>
      VersionedLake.upsert(s, dir,
        Seq((i.toLong, s"u$i")).toDF("id", "v"), keys = Seq("id"))
    }
    val feed = VersionedLake.readRowChanges(s, dir, 0, 12)
    // every artifact-backed version reads through ONE multi-path parquet
    // scan: the analyzed plan carries exactly one relation over changes/
    // (a per-version formulation would carry 12) — the property that
    // keeps a 10k-commit t$changes window analyzable at all
    val rels = feed.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation
          if lr.relation.toString.contains("/changes/") ||
            lr.relation.asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
              .location.rootPaths.exists(_.toString.contains("/changes/")) => lr
    }
    assert(rels.size === 1,
      s"expected ONE batched artifact scan, found ${rels.size}")
    // and the batched read is still exact: one update pre/post pair per
    // commit, each tagged with its own version
    val got = changes(dir, 0, 12)
    val want = (0 until 12).flatMap { i =>
      Seq((i.toLong, s"v$i", "update_preimage", (i + 1).toLong),
        (i.toLong, s"u$i", "update_postimage", (i + 1).toLong))
    }.toSet
    assert(got === want)
  }
}
