package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CDC-fed mirror replication: bootstrap snapshot, incremental windows
  * applying only the row delta, delete propagation, exactly-once
  * watermarks, and the load-bearing pin — after any mutation mix on the
  * source, one sync makes the mirror row-identical to the source.
  */
class LakeReplicateSpec extends SparkSpec {

  private def rows(dir: String): Set[(Long, String)] =
    VersionedLake.read(spark, dir).select("id", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  private def fresh(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString + "/t"

  test("bootstrap then incremental sync mirrors upserts and deletes exactly") {
    val s = spark
    import s.implicits._
    val src = fresh("rep_src")
    val dst = fresh("rep_dst")
    VersionedLake.appendCommit(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), src)
    LakeReplicate.sync(s, src, dst, keys = Seq("id"))
    assert(rows(dst) === rows(src), "bootstrap must copy the snapshot")
    val v1 = VersionedLake.currentVersion(s, dst).get

    // a mutation mix: CoW update, MoR upsert, keyed delete, plain append
    VersionedLake.updateWhere(s, src, col("id") === 1L, Map("v" -> lit("a2")))
    VersionedLake.upsertMor(s, src, Seq((2L, "b2"), (9L, "new")).toDF("id", "v"), Seq("id"))
    VersionedLake.deleteKeysMor(s, src, Seq(3L).toDF("id"), Seq("id"))
    VersionedLake.appendCommit(Seq((7L, "g")).toDF("id", "v"), src)

    LakeReplicate.sync(s, src, dst, keys = Seq("id"))
    assert(rows(dst) === Set((1L, "a2"), (2L, "b2"), (9L, "new"), (7L, "g")),
      "one sync applies the whole window's final state")
    assert(rows(dst) === rows(src), "mirror must be row-identical to the source")
    assert(VersionedLake.currentVersion(s, dst).get === v1 + 1,
      "the incremental window lands as ONE commit")
  }

  test("latest commit per key wins across a window (update then delete, delete then re-insert)") {
    val s = spark
    import s.implicits._
    val src = fresh("rep_lat_src")
    val dst = fresh("rep_lat_dst")
    VersionedLake.appendCommit(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), src)
    LakeReplicate.sync(s, src, dst, keys = Seq("id"))
    // key 1: updated then deleted -> gone; key 2: deleted then re-inserted -> back
    VersionedLake.upsertMor(s, src, Seq((1L, "a2")).toDF("id", "v"), Seq("id"))
    VersionedLake.deleteKeysMor(s, src, Seq(1L, 2L).toDF("id"), Seq("id"))
    VersionedLake.upsertMor(s, src, Seq((2L, "b3")).toDF("id", "v"), Seq("id"))
    LakeReplicate.sync(s, src, dst, keys = Seq("id"))
    assert(rows(dst) === Set((2L, "b3")), "per key the newest commit decides")
  }

  test("sync is exactly-once: an applied window re-syncs as a no-op, no new commit") {
    val s = spark
    import s.implicits._
    val src = fresh("rep_once_src")
    val dst = fresh("rep_once_dst")
    VersionedLake.appendCommit(Seq((1L, "a")).toDF("id", "v"), src)
    LakeReplicate.sync(s, src, dst, keys = Seq("id"))
    VersionedLake.appendCommit(Seq((2L, "b")).toDF("id", "v"), src)
    val after = LakeReplicate.sync(s, src, dst, keys = Seq("id"))
    assert(LakeReplicate.sync(s, src, dst, keys = Seq("id")) === after,
      "an up-to-date mirror must not commit")
    assert(VersionedLake.currentVersion(s, dst).get === after)
    assert(LakeReplicate.appliedVersion(s, src, dst) ===
      VersionedLake.currentVersion(s, src),
      "the watermark records the applied source version")
  }

  test("multi-row keys replicate whole: all final-version rows of a key ride") {
    val s = spark
    import s.implicits._
    val src = fresh("rep_multi_src")
    val dst = fresh("rep_multi_dst")
    VersionedLake.appendCommit(Seq((1L, "a")).toDF("id", "v"), src)
    LakeReplicate.sync(s, src, dst, keys = Seq("id"))
    // an append adds TWO rows under one key - both must land
    VersionedLake.appendCommit(Seq((5L, "x"), (5L, "y")).toDF("id", "v"), src)
    LakeReplicate.sync(s, src, dst, keys = Seq("id"))
    assert(rows(dst) === Set((1L, "a"), (5L, "x"), (5L, "y")))
  }

  test("appends under an EXISTING key add to the mirror's rows, never replace them") {
    val s = spark
    import s.implicits._
    val src = fresh("rep_addkey_src")
    val dst = fresh("rep_addkey_dst")
    VersionedLake.appendCommit(Seq((5L, "x"), (1L, "a")).toDF("id", "v"), src)
    LakeReplicate.sync(s, src, dst, keys = Seq("id"))
    // a LATER append adds a second row under key 5 - the mirror must end
    // holding both (latest-commit-wins reduction would drop (5,'x'))
    VersionedLake.appendCommit(Seq((5L, "y")).toDF("id", "v"), src)
    LakeReplicate.sync(s, src, dst, keys = Seq("id"))
    assert(rows(dst) === Set((5L, "x"), (5L, "y"), (1L, "a")))
    assert(rows(dst) === rows(src))
    // replay order matters: replace-then-append keeps the append,
    // append-then-replace keeps only the replacement
    VersionedLake.upsertMor(s, src, Seq((5L, "z")).toDF("id", "v"), Seq("id"))
    VersionedLake.appendCommit(Seq((5L, "w")).toDF("id", "v"), src)
    LakeReplicate.sync(s, src, dst, keys = Seq("id"))
    assert(rows(dst) === Set((5L, "z"), (5L, "w"), (1L, "a")),
      "post-replace appends survive, pre-replace rows are gone")
    assert(rows(dst) === rows(src))
  }

  test("a window netting to NO mirror change still advances the watermark (metadata-only)") {
    val s = spark
    import s.implicits._
    val src = fresh("rep_noop_src")
    val dst = fresh("rep_noop_dst")
    VersionedLake.appendCommit(Seq((1L, "a")).toDF("id", "v"), src)
    LakeReplicate.sync(s, src, dst, keys = Seq("id"))
    // insert-then-delete: the window's net effect on the mirror is zero
    VersionedLake.upsertMor(s, src, Seq((9L, "z")).toDF("id", "v"), Seq("id"))
    VersionedLake.deleteKeysMor(s, src, Seq(9L).toDF("id"), Seq("id"))
    LakeReplicate.sync(s, src, dst, keys = Seq("id"))
    assert(rows(dst) === Set((1L, "a")))
    assert(LakeReplicate.appliedVersion(s, src, dst) ===
      VersionedLake.currentVersion(s, src),
      "the watermark must advance past the no-net-effect window, or every " +
        "later sync re-reads it (and wedges once retention reclaims it)")
    val before = VersionedLake.currentVersion(s, dst).get
    LakeReplicate.sync(s, src, dst, keys = Seq("id"))
    assert(VersionedLake.currentVersion(s, dst).get === before,
      "once recorded, re-syncing the quiet source commits nothing")
  }

  test("source schema changes replicate: rename and widen align the mirror metadata-only") {
    val s = spark
    import s.implicits._
    val src = fresh("rep_schema_src")
    val dst = fresh("rep_schema_dst")
    VersionedLake.appendCommit(Seq((1L, "a", 1)).toDF("id", "v", "n"), src)
    LakeReplicate.sync(s, src, dst, keys = Seq("id"))
    // metadata-only changes at the source + a data commit in one window
    VersionedLake.renameColumn(s, src, "v", "val")
    VersionedLake.widenColumn(s, src, "n", org.apache.spark.sql.types.LongType)
    VersionedLake.upsertMor(s, src,
      Seq((1L, "a2", 5000000000L)).toDF("id", "val", "n"), keys = Seq("id"))
    LakeReplicate.sync(s, src, dst, keys = Seq("id"))
    val sch = VersionedLake.read(s, dst).schema
    assert(sch.fieldNames.toSeq.contains("val") && !sch.fieldNames.toSeq.contains("v"),
      s"the source rename must align the mirror, not split it: ${sch.fieldNames.toSeq}")
    assert(sch("n").dataType === org.apache.spark.sql.types.LongType,
      "the source widen must align the mirror's type")
    val got = VersionedLake.read(s, dst).select("id", "val", "n").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, "a2", 5000000000L)),
      "the post-rename, beyond-INT batch lands exactly")
  }

  test("a source DROP COLUMN replicates on the next sync, even with no row delta") {
    val s = spark
    import s.implicits._
    val src = fresh("rep_drop_src")
    val dst = fresh("rep_drop_dst")
    VersionedLake.appendCommit(Seq((1L, "a", "junk")).toDF("id", "v", "extra"), src)
    LakeReplicate.sync(s, src, dst, keys = Seq("id"))
    VersionedLake.dropColumn(s, src, "extra")
    LakeReplicate.sync(s, src, dst, keys = Seq("id")) // zero-row window
    assert(!VersionedLake.read(s, dst).schema.fieldNames.contains("extra"),
      "the drop must align even when the window carries no rows")
    assert(LakeReplicate.appliedVersion(s, src, dst) ===
      VersionedLake.currentVersion(s, src),
      "the zero-row window still advances the watermark")
  }

  test("a source rename-then-drop in ONE window still drops the mirror's pre-rename column") {
    val s = spark
    import s.implicits._
    val src = fresh("rep_rd_src")
    val dst = fresh("rep_rd_dst")
    VersionedLake.appendCommit(Seq((1L, "a", "x")).toDF("id", "v", "tmp"), src)
    LakeReplicate.sync(s, src, dst, keys = Seq("id"))
    VersionedLake.renameColumn(s, src, "tmp", "tmp2")
    VersionedLake.dropColumn(s, src, "tmp2")
    LakeReplicate.sync(s, src, dst, keys = Seq("id"))
    val names = VersionedLake.read(s, dst).schema.fieldNames.toSeq
    assert(!names.contains("tmp") && !names.contains("tmp2"),
      s"the tombstone must be found through its FORMER names too: $names")
  }

  test("a replaceWhere window replicates: same-version delete+insert pairs survive replay") {
    val s = spark
    import s.implicits._
    val src = fresh("rep_rw_src")
    val dst = fresh("rep_rw_dst")
    VersionedLake.appendCommit(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), src)
    LakeReplicate.sync(s, src, dst, keys = Seq("id"))
    // replace_where commits the matched pre-images as `delete` and the
    // batch as `insert` at the SAME version; a key re-supplied in the
    // overwritten scope (id=1) must come back on the mirror — a
    // strictly-greater replay filter would apply the delete and drop
    // the re-insert, silently diverging
    VersionedLake.replaceWhere(s, src, col("id") <= 2L,
      Seq((1L, "a2"), (4L, "d")).toDF("id", "v"))
    LakeReplicate.sync(s, src, dst, keys = Seq("id"))
    assert(rows(dst) === Set((1L, "a2"), (3L, "c"), (4L, "d")),
      "the re-supplied key must survive its own same-version replacing delete")
    assert(rows(dst) === rows(src))
  }

  test("syncing into an unrelated populated table refuses loudly") {
    val s = spark
    import s.implicits._
    val src = fresh("rep_ref_src")
    val dst = fresh("rep_ref_dst")
    VersionedLake.appendCommit(Seq((1L, "a")).toDF("id", "v"), src)
    VersionedLake.appendCommit(Seq((9L, "z")).toDF("id", "v"), dst)
    val e = intercept[IllegalStateException](
      LakeReplicate.sync(s, src, dst, keys = Seq("id")))
    assert(e.getMessage.contains("watermark"),
      s"merging two histories silently is the failure mode to refuse: ${e.getMessage}")
  }

  test("continuous replication: readChanges stream + applyDelta keeps a live mirror") {
    val s = spark
    import s.implicits._
    val src = fresh("rep_stream_src")
    val dst = fresh("rep_stream_dst")
    VersionedLake.appendCommit(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), src)
    val q = s.readStream.format("graft-lake")
      .option("path", src).option("readChanges", "true").load()
      .writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("rep_stream_ck").toString)
      .foreachBatch { (delta: org.apache.spark.sql.DataFrame, id: Long) =>
        LakeReplicate.applyDelta(s, delta, dst, Seq("id"),
          appId = "rep-stream-spec", batchId = id): Unit
      }.start()
    try {
      q.processAllAvailable()
      assert(rows(dst) === rows(src), "the initial batch bootstraps the mirror")
      VersionedLake.upsertMor(s, src, Seq((2L, "b2"), (7L, "g")).toDF("id", "v"), Seq("id"))
      VersionedLake.deleteKeysMor(s, src, Seq(1L).toDF("id"), Seq("id"))
      q.processAllAvailable()
      assert(rows(dst) === Set((2L, "b2"), (7L, "g")),
        "mutations flow through the stream as they commit")
      assert(rows(dst) === rows(src))
    } finally q.stop()
  }

  test("mirrors chain: a mirror's own commit log replicates onward") {
    val s = spark
    import s.implicits._
    val src = fresh("rep_chain_src")
    val mid = fresh("rep_chain_mid")
    val end = fresh("rep_chain_end")
    VersionedLake.appendCommit(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), src)
    LakeReplicate.sync(s, src, mid, keys = Seq("id"))
    LakeReplicate.sync(s, mid, end, keys = Seq("id"))
    VersionedLake.upsertMor(s, src, Seq((2L, "b2")).toDF("id", "v"), Seq("id"))
    VersionedLake.deleteKeysMor(s, src, Seq(1L).toDF("id"), Seq("id"))
    LakeReplicate.sync(s, src, mid, keys = Seq("id"))
    LakeReplicate.sync(s, mid, end, keys = Seq("id"))
    assert(rows(end) === Set((2L, "b2")), "the delta propagates through the chain")
  }

  test("verify detects rows differing only in WHICH column holds the null") {
    val s = spark
    import s.implicits._
    val src = fresh("rep_ver_src")
    val dst = fresh("rep_ver_dst")
    VersionedLake.appendCommit(
      Seq((1L, Some("a"), Option.empty[String]), (2L, Some("b"), Some("c")))
        .toDF("id", "x", "y"), src)
    LakeReplicate.sync(s, src, dst, keys = Seq("id"))
    val (_, so0, do0) = LakeReplicate.verify(s, src, dst)
    assert(so0 === 0L && do0 === 0L, "a faithful mirror audits clean")
    // out-of-band tamper: row 1's value migrates x -> y. xxhash64 SKIPS
    // null inputs, so without null-position markers both variants hash
    // the same byte sequence and the divergence would read as clean.
    VersionedLake.upsert(s, dst,
      Seq((1L, Option.empty[String], Some("a"))).toDF("id", "x", "y"),
      keys = Seq("id"))
    val (_, so1, do1) = LakeReplicate.verify(s, src, dst)
    assert(so1 === 1L && do1 === 1L,
      "null-position swaps are real divergence and must be reported")
  }

  test("bootstrap carries CHECK constraints to the mirror; UNIQUE/FK stay source-side") {
    val s = spark
    import s.implicits._
    val src = fresh("rep_csrc")
    val dst = fresh("rep_cdst")
    val parent = fresh("rep_cpar")
    VersionedLake.appendCommit(Seq((1L, "p")).toDF("pid", "p"), parent)
    VersionedLake.appendCommit(Seq((1L, 10L, 1L), (2L, 20L, 1L))
      .toDF("id", "amount", "fk"), src)
    LakeConstraints.add(s, src, "pos_amount", "amount > 0")
    LakeConstraints.addUnique(s, src, "pk", Seq("id"))
    LakeConstraints.addFk(s, src, "fkp", Seq("fk"), parent, Seq("pid"))
    LakeReplicate.sync(s, src, dst, keys = Seq("id"))
    // the CHECK carried: a direct bad write into the mirror refuses
    assert(LakeConstraints.constraintsOf(s, dst) === Seq("pos_amount" -> "amount > 0"))
    val e = intercept[IllegalArgumentException](VersionedLake.appendCommit(
      Seq((9L, -5L, 1L)).toDF("id", "amount", "fk"), dst))
    assert(e.getMessage.contains("pos_amount"), e.getMessage)
    // UNIQUE/FK did NOT carry (documented: FK enforcement would refuse a
    // faithful child-first sync; UNIQUE re-pays the writer's invariant)
    assert(LakeConstraints.uniquesOf(s, dst).isEmpty)
    assert(LakeConstraints.fksOf(s, dst).isEmpty)
    // the carried CHECK never refuses a faithful sync
    VersionedLake.appendCommit(Seq((3L, 30L, 1L)).toDF("id", "amount", "fk"), src)
    LakeReplicate.sync(s, src, dst, keys = Seq("id"))
    assert(VersionedLake.read(s, dst).count() === 3L)
  }
}
