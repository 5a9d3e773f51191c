package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Named refs ([[LakeRefs]]) and write-audit-publish ([[LakeWap]]):
  * tags time-travel by name and pin versions against vacuum; a WAP
  * stages invisibly, audits the real would-be table, and swaps to main
  * atomically — or aborts without a trace.
  */
class LakeWapSpec extends SparkSpec {

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString + "/t"

  private def ids(dir: String): Set[Long] =
    VersionedLake.read(spark, dir).select("id").collect().map(_.getLong(0)).toSet

  test("tags: time travel by name in SQL; vacuum keeps a tagged version alive") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("refs_cat").toString
    s.conf.set("spark.sql.catalog.gref", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.gref.root", root)
    s.sql("CREATE TABLE gref.t (id BIGINT, v STRING)")
    s.sql("INSERT INTO gref.t VALUES (1, 'a')")
    val dir = s"$root/t"
    LakeRefs.tag(s, dir, "release-1", VersionedLake.currentVersion(s, dir).get)
    s.sql("INSERT OVERWRITE gref.t VALUES (9, 'z')") // snapshot: drops v1's dirs
    s.sql("INSERT INTO gref.t VALUES (10, 'y')")
    assert(s.sql("SELECT id FROM gref.t VERSION AS OF 'release-1'")
      .collect().map(_.getLong(0)).toSeq === Seq(1L),
      "the tag resolves by name to its pinned version")
    // duplicate names refuse; unknown names list what exists
    intercept[IllegalArgumentException](LakeRefs.tag(s, dir, "release-1", 0L))
    val e = intercept[IllegalArgumentException](
      s.sql("SELECT * FROM gref.t VERSION AS OF 'nope'").collect())
    assert(e.getMessage.contains("release-1"))
    // vacuum keeps the TAGGED version's manifest and dirs past retention
    VersionedLake.vacuum(s, dir, keepVersions = 1, minAgeMs = 0L)
    assert(s.sql("SELECT id FROM gref.t VERSION AS OF 'release-1'")
      .collect().map(_.getLong(0)).toSeq === Seq(1L),
      "a tagged version must survive vacuum for as long as the tag exists")
    // dropping the tag releases it: the next vacuum reclaims
    LakeRefs.drop(s, dir, "release-1")
    VersionedLake.vacuum(s, dir, keepVersions = 1, minAgeMs = 0L)
    intercept[Exception](
      s.sql("SELECT id FROM gref.t VERSION AS OF 1").collect())
  }

  test("refs CAS under contention: every writer's ref lands; re-create is idempotent") {
    val s = spark
    val dir = java.nio.file.Files.createTempDirectory("refs_race").toString
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val futures = (0 until 4).map { t =>
        pool.submit(new Runnable {
          def run(): Unit =
            (0 until 5).foreach(i => LakeRefs.tag(s, dir, s"r$t-$i", (t * 5 + i).toLong))
        })
      }
      futures.foreach(_.get())
    } finally pool.shutdown()
    val got = LakeRefs.list(s, dir)
    assert(got.size === 20, s"all 20 racing tags must land: ${got.keys.toSeq.sorted}")
    // identical re-create is a no-op (the CAS retry contract), a
    // conflicting one refuses
    LakeRefs.tag(s, dir, "r0-0", 0L)
    intercept[IllegalArgumentException](LakeRefs.tag(s, dir, "r0-0", 99L))
  }

  test("WAP: staged invisible, audit reads the would-be table, publish swaps atomically") {
    val s = spark
    import s.implicits._
    val dir = tmp("wap_pub")
    VersionedLake.appendCommit(Seq((1L, "a")).toDF("id", "v"), dir)
    val staged = LakeWap.begin(s, dir, "staging") {
      VersionedLake.appendCommit(Seq((2L, "b"), (3L, "c")).toDF("id", "v"), dir): Unit
    }
    // WRITE done: invisible to readers
    assert(ids(dir) === Set(1L), "the staged commit must be invisible pre-publish")
    assert(VersionedLake.currentVersion(s, dir).contains(0L))
    // AUDIT: the staged snapshot is the FULL would-be table
    assert(LakeWap.read(s, staged).select("id").collect().map(_.getLong(0)).toSet ===
      Set(1L, 2L, 3L))
    assert(LakeRefs.resolve(s, dir, "staging").contains(staged.version),
      "the branch ref names the staged version for audit-by-name")
    // PUBLISH: the atomic swap
    LakeWap.publish(s, staged)
    assert(ids(dir) === Set(1L, 2L, 3L))
    assert(VersionedLake.currentVersion(s, dir).contains(1L))
    assert(LakeRefs.resolve(s, dir, "staging").isEmpty, "publishing retires the branch")
    // double publish refuses as a conflict (decision slot already taken)
    intercept[VersionedLake.CommitConflictException](LakeWap.publish(s, staged))
  }

  test("WAP abort: nothing was ever visible; the table continues cleanly") {
    val s = spark
    import s.implicits._
    val dir = tmp("wap_abort")
    VersionedLake.appendCommit(Seq((1L, "a")).toDF("id", "v"), dir)
    val staged = LakeWap.begin(s, dir, "staging") {
      VersionedLake.appendCommit(Seq((666L, "bad")).toDF("id", "v"), dir): Unit
    }
    // audit found a problem: abort
    LakeWap.abort(s, staged)
    assert(ids(dir) === Set(1L))
    assert(LakeRefs.resolve(s, dir, "staging").isEmpty)
    // the slot is free again: an ordinary commit takes it
    VersionedLake.appendCommit(Seq((2L, "b")).toDF("id", "v"), dir)
    assert(ids(dir) === Set(1L, 2L))
    assert(VersionedLake.currentVersion(s, dir).contains(1L))
    // aborting after publish refuses loudly (nothing silently un-publishes)
    val staged2 = LakeWap.begin(s, dir, "s2") {
      VersionedLake.appendCommit(Seq((3L, "c")).toDF("id", "v"), dir): Unit
    }
    LakeWap.publish(s, staged2)
    intercept[IllegalArgumentException](LakeWap.abort(s, staged2))
    assert(ids(dir) === Set(1L, 2L, 3L))
  }

  test("a leftover branch ref refuses begin() BEFORE fencing the table") {
    val s = spark
    import s.implicits._
    val dir = tmp("wap_leftover")
    VersionedLake.appendCommit(Seq((1L, "a")).toDF("id", "v"), dir)
    LakeRefs.branch(s, dir, "staging", 0L) // a crashed WAP's orphaned ref
    val e = intercept[IllegalArgumentException] {
      LakeWap.begin(s, dir, "staging") {
        VersionedLake.appendCommit(Seq((2L, "b")).toDF("id", "v"), dir): Unit
      }
    }
    assert(e.getMessage.contains("leftover"))
    assert(!new java.io.File(s"$dir/manifest/v=1.txt").exists(),
      "the refusal must fire before any claim fences the table")
    // an ordinary commit proceeds immediately (no orphaned fence)
    VersionedLake.appendCommit(Seq((3L, "c")).toDF("id", "v"), dir)
    assert(ids(dir) === Set(1L, 3L))
  }

  test("a late abort() never deletes another writer's re-claimed manifest") {
    val s = spark
    import s.implicits._
    val dir = tmp("wap_late")
    VersionedLake.appendCommit(Seq((1L, "a")).toDF("id", "v"), dir)
    val staged = LakeWap.begin(s, dir, "late") {
      VersionedLake.appendCommit(Seq((2L, "stale")).toDF("id", "v"), dir): Unit
    }
    // a healer aborts the stalled WAP and another writer re-claims the
    // SAME version number with a real commit
    VersionedLake.createExclusive(s, staged.decisionDir, staged.decisionName, "abort")
    assert(new java.io.File(s"$dir/manifest/v=${staged.version}.txt").delete())
    VersionedLake.invalidateManifestCache(dir, staged.version)
    VersionedLake.appendCommit(Seq((9L, "winner")).toDF("id", "v"), dir)
    assert(ids(dir) === Set(1L, 9L))
    // the auditor finally calls abort(): it must leave the winner alone
    LakeWap.abort(s, staged)
    assert(ids(dir) === Set(1L, 9L),
      "abort must verify slot ownership before deleting")
    assert(VersionedLake.currentVersion(s, dir).contains(staged.version))
  }

  test("publish refuses a stale handle when the branch was re-pointed mid-audit") {
    val s = spark
    import s.implicits._
    val dir = tmp("wap_repoint")
    VersionedLake.appendCommit(Seq((1L, "a")).toDF("id", "v"), dir)
    val staged = LakeWap.begin(s, dir, "staging") {
      VersionedLake.appendCommit(Seq((2L, "b")).toDF("id", "v"), dir): Unit
    }
    // an operator re-points the branch at some other version
    LakeRefs.drop(s, dir, "staging")
    LakeRefs.branch(s, dir, "staging", 0L)
    val e = intercept[IllegalArgumentException](LakeWap.publish(s, staged))
    assert(e.getMessage.contains("re-pointed"))
    assert(ids(dir) === Set(1L), "nothing may publish under a re-pointed name")
    // the stale handle can still be aborted; the re-pointed ref survives
    LakeWap.abort(s, staged)
    assert(LakeRefs.resolve(s, dir, "staging").contains(0L),
      "abort's ref retire is value-CAS'd: the re-pointed ref is not ours to drop")
  }

  test("multi-commit branch: N writes chain on the branch, one atomic publish") {
    val s = spark
    import s.implicits._
    val dir = tmp("wap_chain")
    VersionedLake.appendCommit(Seq((1L, "a")).toDF("id", "v"), dir)
    val v0 = VersionedLake.currentVersion(s, dir).get
    // write 1: the backfill
    val h1 = LakeWap.begin(s, dir, "window") {
      VersionedLake.appendCommit(Seq((2L, "b"), (3L, "c")).toDF("id", "v"), dir): Unit
    }
    // write 2: corrections that must SEE the backfill — the upsert's
    // probe reads the chain tip, not published main
    val h2 = LakeWap.write(s, h1) {
      VersionedLake.upsert(s, dir, Seq((3L, "c-fixed"), (4L, "d")).toDF("id", "v"),
        keys = Seq("id")): Unit
    }
    assert(h2.chain === Seq(v0 + 1, v0 + 2))
    assert(LakeRefs.resolve(s, dir, "window").contains(v0 + 2),
      "the branch ref tracks the chain tip")
    // main sees NOTHING; the audit sees BOTH writes at once
    assert(ids(dir) === Set(1L))
    val audited = LakeWap.read(s, h2).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(audited === Set((1L, "a"), (2L, "b"), (3L, "c-fixed"), (4L, "d")),
      "the audit reads the whole chain: backfill + corrections")
    // a concurrent main-branch writer conflicts on the chain's fence
    // (bounded retries, then gives up — the staged claim holds)
    intercept[VersionedLake.CommitConflictException] {
      VersionedLake.retryOnConflict(maxAttempts = 2) {
        VersionedLake.claimManifestSlot(s, dir, v0 + 1, "#op=append\nx")
      }
    }
    assert(ids(dir) === Set(1L), "the loser's attempts changed nothing")
    // ONE publish decides the whole chain atomically
    LakeWap.publish(s, h2)
    assert(ids(dir) === Set(1L, 2L, 3L, 4L))
    assert(VersionedLake.currentVersion(s, dir).contains(v0 + 2))
    assert(VersionedLake.read(s, dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet === audited,
      "published main is exactly what the audit approved")
    // after publish, ordinary writes proceed
    VersionedLake.appendCommit(Seq((9L, "z")).toDF("id", "v"), dir)
    assert(ids(dir) === Set(1L, 2L, 3L, 4L, 9L))
  }

  test("multi-commit branch abort removes the whole chain without a trace") {
    val s = spark
    import s.implicits._
    val dir = tmp("wap_chain_abort")
    VersionedLake.appendCommit(Seq((1L, "a")).toDF("id", "v"), dir)
    val v0 = VersionedLake.currentVersion(s, dir).get
    val h1 = LakeWap.begin(s, dir, "oops") {
      VersionedLake.appendCommit(Seq((2L, "b")).toDF("id", "v"), dir): Unit
    }
    val h2 = LakeWap.write(s, h1) {
      VersionedLake.appendCommit(Seq((3L, "c")).toDF("id", "v"), dir): Unit
    }
    LakeWap.abort(s, h2)
    assert(ids(dir) === Set(1L))
    assert(VersionedLake.currentVersion(s, dir).contains(v0))
    assert(LakeRefs.resolve(s, dir, "oops").isEmpty, "the branch ref retires")
    // the slots are genuinely free again: the next writer claims v0+1
    VersionedLake.appendCommit(Seq((7L, "g")).toDF("id", "v"), dir)
    assert(VersionedLake.currentVersion(s, dir).contains(v0 + 1))
    assert(ids(dir) === Set(1L, 7L))
  }

  test("WAP through SQL: audit with VERSION AS OF '<branch>', DQ-gate, publish") {
    val s = spark
    val root = java.nio.file.Files.createTempDirectory("wap_cat").toString
    s.conf.set("spark.sql.catalog.gwap", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.gwap.root", root)
    s.sql("CREATE TABLE gwap.t (id BIGINT, v STRING)")
    s.sql("INSERT INTO gwap.t VALUES (1, 'a')")
    val dir = s"$root/t"
    val staged = LakeWap.begin(s, dir, "audit-me") {
      s.sql("INSERT INTO gwap.t VALUES (2, 'b'), (3, NULL)"): Unit
    }
    assert(s.sql("SELECT count(*) FROM gwap.t").head().getLong(0) === 1L,
      "SQL readers of main see nothing pre-publish")
    // the audit is plain SQL time travel to the branch name
    val nulls = s.sql(
      "SELECT count(*) FROM gwap.t VERSION AS OF 'audit-me' WHERE v IS NULL")
      .head().getLong(0)
    assert(nulls === 1L, "the audit sees the staged rows")
    // this audit tolerates the null: publish
    LakeWap.publish(s, staged)
    assert(s.sql("SELECT count(*) FROM gwap.t").head().getLong(0) === 3L)
  }
}
