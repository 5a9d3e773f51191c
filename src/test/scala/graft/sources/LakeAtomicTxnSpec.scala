package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multi-table atomic commit ([[LakeAtomicTxn]]): all-or-nothing visibility
  * across tables, crash healing at every protocol phase, and the
  * replication consumer ([[LakeReplicate.syncAll]]). The crash tests
  * drive the protocol's phases by hand (same-package access) and assert
  * that NO interleaving exposes table A at its new version with table B
  * at its old one.
  */
class LakeAtomicTxnSpec extends SparkSpec {

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  private def rows(dir: String): Set[(Long, String)] =
    VersionedLake.read(spark, dir).select("id", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  test("commitAll publishes N tables all-or-nothing; versions land per table") {
    val s = spark
    import s.implicits._
    val a = tmp("txn_a") + "/t"
    val b = tmp("txn_b") + "/t"
    VersionedLake.appendCommit(Seq((1L, "a")).toDF("id", "v"), a)
    VersionedLake.appendCommit(Seq((1L, "b")).toDF("id", "v"), b)
    val vs = LakeAtomicTxn.commitAll(s, a) {
      VersionedLake.appendCommit(Seq((2L, "a2")).toDF("id", "v"), a): Unit
      VersionedLake.appendCommit(Seq((2L, "b2")).toDF("id", "v"), b): Unit
    }
    assert(vs === Seq(1L, 1L))
    assert(rows(a) === Set((1L, "a"), (2L, "a2")))
    assert(rows(b) === Set((1L, "b"), (2L, "b2")))
    // finalized: the manifests carry no pending marker
    assert(VersionedLake.txn2pcDecisionPath(s, a, 1L).isEmpty)
    assert(VersionedLake.txn2pcDecisionPath(s, b, 1L).isEmpty)
    // ordinary single-table commits continue cleanly after the txn
    VersionedLake.appendCommit(Seq((3L, "a3")).toDF("id", "v"), a)
    assert(VersionedLake.currentVersion(s, a).contains(2L))
  }

  /** Stage + claim both tables but CRASH before the decision: neither
    * table's new version may be visible, and once the claims go stale a
    * later committer aborts the txn and proceeds.
    */
  test("crash BEFORE decision: pending versions invisible; stale txn heals as abort") {
    val s = spark
    import s.implicits._
    val a = tmp("txn_ca") + "/t"
    val b = tmp("txn_cb") + "/t"
    VersionedLake.appendCommit(Seq((1L, "a")).toDF("id", "v"), a)
    VersionedLake.appendCommit(Seq((1L, "b")).toDF("id", "v"), b)
    // hand-drive phases 1-2: stage, claim, then "crash"
    val decision = s"$a/txn2pc/crashed-txn.txt"
    val st = new LakeAtomicTxn.Staging
    LakeAtomicTxn.staging.set(st)
    try {
      VersionedLake.appendCommit(Seq((2L, "a2")).toDF("id", "v"), a): Unit
      VersionedLake.appendCommit(Seq((2L, "b2")).toDF("id", "v"), b): Unit
    } finally LakeAtomicTxn.staging.remove()
    st.staged.foreach { sg =>
      VersionedLake.claimManifestSlot(s, sg.tableDir, sg.version,
        s"${VersionedLake.Txn2pcHeader}$decision\n${sg.body}")
    }
    // no decision: both tables still read the OLD version
    assert(VersionedLake.currentVersion(s, a).contains(0L),
      "a pending undecided txn version must be invisible")
    assert(VersionedLake.currentVersion(s, b).contains(0L))
    assert(rows(a) === Set((1L, "a")))
    assert(rows(b) === Set((1L, "b")))
    // age the claims past the grace window: the next committer on A
    // aborts the txn (decision slot raced) and claims the version
    Seq(a, b).foreach { d =>
      assert(new java.io.File(s"$d/manifest/v=1.txt").setLastModified(
        System.currentTimeMillis() - VersionedLake.OrphanManifestGraceMs - 5000))
    }
    VersionedLake.appendCommit(Seq((9L, "heal")).toDF("id", "v"), a)
    assert(rows(a) === Set((1L, "a"), (9L, "heal")),
      "the healer's commit lands; the dead txn's rows never appear")
    val decided = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(decision.stripPrefix("file:"))),
      java.nio.charset.StandardCharsets.UTF_8).trim
    assert(decided === "abort", "healing must kill the txn via its decision slot")
    // B's pending claim is now provably dead too: a commit there reclaims
    VersionedLake.appendCommit(Seq((9L, "heal")).toDF("id", "v"), b)
    assert(rows(b) === Set((1L, "b"), (9L, "heal")),
      "the aborted txn's B half must never surface either")
  }

  /** Claims + decision written, CRASH before finalize: BOTH tables are
    * visible at their new versions from the decision instant — the
    * atomic point — and later committers finalize on the dead
    * coordinator's behalf.
    */
  test("crash AFTER decision: both tables visible immediately; healer finalizes") {
    val s = spark
    import s.implicits._
    val a = tmp("txn_da") + "/t"
    val b = tmp("txn_db") + "/t"
    VersionedLake.appendCommit(Seq((1L, "a")).toDF("id", "v"), a)
    VersionedLake.appendCommit(Seq((1L, "b")).toDF("id", "v"), b)
    val st = new LakeAtomicTxn.Staging
    LakeAtomicTxn.staging.set(st)
    try {
      VersionedLake.appendCommit(Seq((2L, "a2")).toDF("id", "v"), a): Unit
      VersionedLake.appendCommit(Seq((2L, "b2")).toDF("id", "v"), b): Unit
    } finally LakeAtomicTxn.staging.remove()
    val decision = s"$a/txn2pc/decided-txn.txt"
    st.staged.foreach { sg =>
      VersionedLake.claimManifestSlot(s, sg.tableDir, sg.version,
        s"${VersionedLake.Txn2pcHeader}$decision\n${sg.body}")
    }
    // the atomic point: decide commit, then "crash" before finalize
    VersionedLake.createExclusive(s, s"$a/txn2pc", "decided-txn.txt", "commit")
    assert(VersionedLake.txn2pcDecisionPath(s, a, 1L).isDefined &&
      VersionedLake.txn2pcDecisionPath(s, b, 1L).isDefined,
      "the coordinator died before finalize - markers still in place")
    // NO state exposes A-new with B-old: both resolve the new version
    // through the decision
    assert(VersionedLake.currentVersion(s, a).contains(1L))
    assert(VersionedLake.currentVersion(s, b).contains(1L))
    assert(rows(a) === Set((1L, "a"), (2L, "a2")))
    assert(rows(b) === Set((1L, "b"), (2L, "b2")))
    // the first reader finalized on the dead coordinator's behalf
    assert(VersionedLake.txn2pcDecisionPath(s, a, 1L).isEmpty,
      "eager hygiene must strip the committed marker on first read")
    // ordinary commits continue cleanly on the healed table
    VersionedLake.appendCommit(Seq((3L, "a3")).toDF("id", "v"), a)
    assert(rows(a) === Set((1L, "a"), (2L, "a2"), (3L, "a3")))
  }

  test("claim race: a concurrent commit between stage and claim re-bases the whole txn") {
    val s = spark
    import s.implicits._
    val a = tmp("txn_ra") + "/t"
    val b = tmp("txn_rb") + "/t"
    VersionedLake.appendCommit(Seq((1L, "a")).toDF("id", "v"), a)
    VersionedLake.appendCommit(Seq((1L, "b")).toDF("id", "v"), b)
    // inject a competitor exactly once, inside the first stage run:
    // the stage computes its versions, then the competitor takes A's
    // slot, so claim conflicts and the txn must re-stage and land after
    var injected = false
    LakeAtomicTxn.commitAll(s, a) {
      VersionedLake.appendCommit(Seq((2L, "a2")).toDF("id", "v"), a): Unit
      VersionedLake.appendCommit(Seq((2L, "b2")).toDF("id", "v"), b): Unit
      if (!injected) {
        injected = true
        val prev = LakeAtomicTxn.staging.get()
        LakeAtomicTxn.staging.remove() // the competitor is NOT part of the txn
        try VersionedLake.appendCommit(Seq((7L, "race")).toDF("id", "v"), a): Unit
        finally LakeAtomicTxn.staging.set(prev)
      }
    }
    assert(rows(a) === Set((1L, "a"), (7L, "race"), (2L, "a2")),
      "both the competitor and the re-based txn must land")
    assert(rows(b) === Set((1L, "b"), (2L, "b2")))
  }

  test("a ZERO-LENGTH decision file (coordinator died mid-create) heals; tables unwedge") {
    val s = spark
    import s.implicits._
    val a = tmp("txn_z") + "/t"
    VersionedLake.appendCommit(Seq((1L, "a")).toDF("id", "v"), a)
    val decision = s"$a/txn2pc/zl-txn.txt"
    val st = new LakeAtomicTxn.Staging
    LakeAtomicTxn.staging.set(st)
    try VersionedLake.appendCommit(Seq((2L, "x")).toDF("id", "v"), a): Unit
    finally LakeAtomicTxn.staging.remove()
    val sg = st.staged.head
    VersionedLake.claimManifestSlot(s, a, sg.version,
      s"${VersionedLake.Txn2pcHeader}$decision\n${sg.body}")
    // the coordinator crashed INSIDE its decision create: empty fence
    val df = new java.io.File(decision)
    df.getParentFile.mkdirs()
    assert(df.createNewFile())
    // age both the claim and the empty decision past the grace window
    assert(new java.io.File(s"$a/manifest/v=1.txt").setLastModified(
      System.currentTimeMillis() - VersionedLake.OrphanManifestGraceMs - 5000))
    assert(df.setLastModified(
      System.currentTimeMillis() - VersionedLake.OrphanManifestGraceMs - 5000))
    // without the zero-length-decision heal, this commit would conflict
    // forever (the abort create always loses to the empty file)
    VersionedLake.appendCommit(Seq((9L, "heal")).toDF("id", "v"), a)
    assert(rows(a) === Set((1L, "a"), (9L, "heal")))
  }

  test("staging does not nest: a transaction inside a transaction refuses up front") {
    val s = spark
    import s.implicits._
    val a = tmp("txn_nest") + "/t"
    VersionedLake.appendCommit(Seq((1L, "a")).toDF("id", "v"), a)
    val e = intercept[IllegalArgumentException] {
      LakeAtomicTxn.commitAll(s, a) {
        LakeAtomicTxn.commitAll(s, a) {
          VersionedLake.appendCommit(Seq((2L, "x")).toDF("id", "v"), a): Unit
        }: Unit
      }
    }
    assert(e.getMessage.contains("nest"),
      "a nested txn would silently swap the outer staging out")
    assert(VersionedLake.currentVersion(s, a).contains(0L),
      "nothing may have committed from the refused composition")
  }

  test("syncAll aligns a renamed source pre-txn, then applies the delta atomically") {
    val s = spark
    import s.implicits._
    val src = tmp("txn_als") + "/t"
    val dst = tmp("txn_ald") + "/t"
    VersionedLake.appendCommit(Seq((1L, "a")).toDF("id", "v"), src)
    LakeReplicate.syncAll(s, Seq((src, dst, Seq("id"))), txnDir = dst)
    // a metadata-only rename + a data commit in one window: the
    // alignment must run OUTSIDE the staged txn (it is its own commit)
    VersionedLake.renameColumn(s, src, "v", "val")
    VersionedLake.upsertMor(s, src, Seq((1L, "a2")).toDF("id", "val"), Seq("id"))
    LakeReplicate.syncAll(s, Seq((src, dst, Seq("id"))), txnDir = dst)
    val got = VersionedLake.read(s, dst).select("id", "val").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq === Seq((1L, "a2")))
  }

  test("syncAll: two FK-related mirrors advance atomically, exactly-once") {
    val s = spark
    import s.implicits._
    val srcA = tmp("txn_sa") + "/orders"
    val srcB = tmp("txn_sb") + "/items"
    val dstA = tmp("txn_ma") + "/orders"
    val dstB = tmp("txn_mb") + "/items"
    VersionedLake.appendCommit(Seq((1L, "o1")).toDF("id", "v"), srcA)
    VersionedLake.appendCommit(Seq((1L, "i1")).toDF("id", "v"), srcB)
    val pairs = Seq((srcA, dstA, Seq("id")), (srcB, dstB, Seq("id")))
    LakeReplicate.syncAll(s, pairs, txnDir = dstA)
    assert(rows(dstA) === rows(srcA) && rows(dstB) === rows(srcB))
    // a correlated change on both sources lands as one atomic sync
    VersionedLake.upsertMor(s, srcA, Seq((2L, "o2")).toDF("id", "v"), Seq("id"))
    VersionedLake.upsertMor(s, srcB, Seq((2L, "i2")).toDF("id", "v"), Seq("id"))
    LakeReplicate.syncAll(s, pairs, txnDir = dstA)
    assert(rows(dstA) === Set((1L, "o1"), (2L, "o2")))
    assert(rows(dstB) === Set((1L, "i1"), (2L, "i2")))
    // exactly-once: an up-to-date syncAll commits nothing anywhere
    val va = VersionedLake.currentVersion(s, dstA)
    val vb = VersionedLake.currentVersion(s, dstB)
    LakeReplicate.syncAll(s, pairs, txnDir = dstA)
    assert(VersionedLake.currentVersion(s, dstA) === va)
    assert(VersionedLake.currentVersion(s, dstB) === vb)
  }
}
