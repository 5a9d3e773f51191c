package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** UNIQUE (primary-key-style) constraints with O(delta) enforcement:
  * the commit-time probe checks the batch against itself (one
  * aggregate) and against only the directories the batch's key RANGE
  * overlaps (manifest-stats pruning, one semi-join) — on time-clustered
  * keys that is the newest directory or none, so a 100 TB table pays
  * ingest-sized enforcement, never a table scan. The probe runs INSIDE
  * each committing path's critical section, so two racing writers
  * serialize through the manifest slot: the loser re-bases and
  * re-probes against the winner's rows. SQL UNIQUE semantics: NULL
  * keys never conflict.
  */
class UniqueConstraintSpec extends SparkSpec {

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  test("append-family enforcement: batch dups, cross-commit dups, NULL keys, deleted keys") {
    val s = spark
    import s.implicits._
    val dir = tmp("uq_base")
    VersionedLake.appendCommit(
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir, statsCols = Seq("id"))
    LakeConstraints.addUnique(s, dir, "pk_id", Seq("id"))
    // a batch duplicating itself refuses
    val e1 = intercept[IllegalArgumentException](VersionedLake.appendCommit(
      Seq((3L, "x"), (3L, "y")).toDF("id", "v"), dir))
    assert(e1.getMessage.contains("pk_id") && e1.getMessage.contains("batch itself"))
    // a batch colliding with a committed row refuses
    val e2 = intercept[IllegalArgumentException](VersionedLake.appendCommit(
      Seq((2L, "dup")).toDF("id", "v"), dir))
    assert(e2.getMessage.contains("already exists"), e2.getMessage)
    // nothing half-landed
    assert(VersionedLake.read(s, dir).count() === 2L)
    // NULL keys never conflict (UNIQUE, not NOT NULL)
    VersionedLake.appendCommit(
      Seq((null.asInstanceOf[java.lang.Long], "n1"),
        (null.asInstanceOf[java.lang.Long], "n2"))
        .toDF("id", "v"), dir)
    assert(VersionedLake.read(s, dir).count() === 4L)
    // a deleted key is re-insertable - the probe reads LOGICAL rows
    VersionedLake.deleteWhere(s, dir, col("id") === 1L)
    VersionedLake.appendCommit(Seq((1L, "a2")).toDF("id", "v"), dir)
    assert(VersionedLake.read(s, dir).filter(col("id") === 1L)
      .collect().map(_.getString(1)).toSeq === Seq("a2"))
  }

  test("DDL validates existing rows; the probe prunes to range-overlapping dirs") {
    val s = spark
    import s.implicits._
    val dir = tmp("uq_ddl")
    VersionedLake.appendCommit(
      Seq((1L, "a"), (1L, "b")).toDF("id", "v"), dir)
    val e = intercept[IllegalArgumentException](
      LakeConstraints.addUnique(s, dir, "pk", Seq("id")))
    assert(e.getMessage.contains("already duplicate"), e.getMessage)
    // three key-clustered commits: a new batch far above every range
    // must probe ZERO directories (pruning-only check via plan count -
    // observable through commit succeeding + no refused ranges)
    val dir2 = tmp("uq_prune")
    VersionedLake.appendCommit((0L until 100L).map(i => (i, s"r$i")).toDF("id", "v"),
      dir2, statsCols = Seq("id"))
    VersionedLake.appendCommit((100L until 200L).map(i => (i, s"r$i")).toDF("id", "v"),
      dir2, statsCols = Seq("id"))
    LakeConstraints.addUnique(s, dir2, "pk", Seq("id"))
    // in-range collision caught
    val e2 = intercept[IllegalArgumentException](VersionedLake.appendCommit(
      Seq((150L, "dup")).toDF("id", "v"), dir2))
    assert(e2.getMessage.contains("already exists"))
    // disjoint range lands
    VersionedLake.appendCommit((200L until 300L).map(i => (i, s"r$i")).toDF("id", "v"), dir2)
    assert(VersionedLake.read(s, dir2).count() === 300L)
  }

  test("keyed paths: PK-shaped upsert replaces; mismatched unique set refuses; updates of keys refuse") {
    val s = spark
    import s.implicits._
    val dir = tmp("uq_upsert")
    VersionedLake.appendCommit(
      Seq((1L, "u1", "a"), (2L, "u2", "b")).toDF("id", "user", "v"), dir,
      statsCols = Seq("id"))
    LakeConstraints.addUnique(s, dir, "pk_id", Seq("id"))
    // upsert keyed on the unique set: replacement, not violation
    VersionedLake.upsert(s, dir,
      Seq((2L, "u2", "b2"), (3L, "u3", "c")).toDF("id", "user", "v"), keys = Seq("id"))
    assert(VersionedLake.read(s, dir).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(2))).toSeq ===
      Seq((1L, "a"), (2L, "b2"), (3L, "c")))
    // upsert keyed on a DIFFERENT set cannot preserve the constraint
    val e = intercept[IllegalArgumentException](VersionedLake.upsert(s, dir,
      Seq((9L, "u1", "z")).toDF("id", "user", "v"), keys = Seq("user")))
    assert(e.getMessage.contains("pk_id"), e.getMessage)
    // predicate UPDATE assigning the key column refuses
    val e2 = intercept[IllegalArgumentException](VersionedLake.updateWhere(
      s, dir, col("id") === 3L, Map("id" -> lit(1L))))
    assert(e2.getMessage.contains("replaceWhere"), e2.getMessage)
    // replaceWhere: the delete+insert shape checks against SURVIVORS only
    VersionedLake.replaceWhere(s, dir, col("id") === 3L,
      Seq((3L, "u3", "c2")).toDF("id", "user", "v"))
    assert(VersionedLake.read(s, dir).filter(col("id") === 3L)
      .head().getString(2) === "c2")
    val e3 = intercept[IllegalArgumentException](VersionedLake.replaceWhere(
      s, dir, col("id") === 3L, Seq((1L, "ux", "clash")).toDF("id", "user", "v")))
    assert(e3.getMessage.contains("already exists"), e3.getMessage)
  }

  test("point inserts ride the bloom layer: an in-range fresh key probes zero directories") {
    val s = spark
    import s.implicits._
    val dir = tmp("uq_bloom")
    val bloom = Some(VersionedLake.BloomConfig(Seq("id"), bits = 1 << 14, k = 5))
    // EVEN ids only: every odd id is in-range but absent, so range
    // pruning alone would read the directory - the bloom proves absence
    VersionedLake.appendCommit((0L until 200L by 2).map(i => (i, s"r$i")).toDF("id", "v"),
      dir, statsCols = Seq("id"), bloom = bloom)
    LakeConstraints.addUnique(s, dir, "pk", Seq("id"))
    val v = VersionedLake.currentVersion(s, dir).get
    // the probe's own filter shape (point In + range) prunes to zero
    // candidate dirs for an absent odd key
    import org.apache.spark.sql.sources.{GreaterThanOrEqual, In, LessThanOrEqual}
    assert(VersionedLake.pruneDirsForFilters(s, dir, v, Seq(
      In("id", Array(101L)),
      GreaterThanOrEqual("id", 101L), LessThanOrEqual("id", 101L))).isEmpty,
      "an in-range absent key must be proven absent by the bloom")
    // and the hook lands the insert (no false refusal), refuses a present key
    VersionedLake.appendCommit(Seq((101L, "fresh")).toDF("id", "v"), dir)
    val e = intercept[IllegalArgumentException](VersionedLake.appendCommit(
      Seq((100L, "dup")).toDF("id", "v"), dir))
    assert(e.getMessage.contains("already exists"))
  }

  test("racing writers serialize: the publish-race loser re-probes and refuses") {
    val s = spark
    import s.implicits._
    val dir = tmp("uq_race")
    VersionedLake.appendCommit(Seq((1L, "a")).toDF("id", "v"), dir,
      statsCols = Seq("id"))
    LakeConstraints.addUnique(s, dir, "pk", Seq("id"))
    // two threads insert the SAME key concurrently: exactly one commits
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val results = Await.result(
      Future.sequence((1 to 2).map { i =>
        Future(scala.util.Try(VersionedLake.appendCommit(
          Seq((7L, s"w$i")).toDF("id", "v"), dir)).toEither)
      }), 120.seconds)
    assert(results.count(_.isRight) === 1,
      s"exactly one writer must win: $results")
    assert(results.count(_.left.exists(
      _.getMessage.contains("already exists"))) === 1,
      s"the loser must refuse on its re-probe: $results")
    assert(VersionedLake.read(s, dir).filter(col("id") === 7L).count() === 1L)
  }

  test("SQL face: TBLPROPERTIES unique.<name>, t$constraints shows it, INSERT enforces") {
    val s = spark
    val root = tmp("uq_sql")
    s.conf.set("spark.sql.catalog.uqcat", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.uqcat.root", root)
    s.sql("CREATE TABLE uqcat.t (id BIGINT, v STRING)")
    s.sql("INSERT INTO uqcat.t VALUES (1, 'a'), (2, 'b')")
    s.sql("ALTER TABLE uqcat.t SET TBLPROPERTIES ('unique.pk' = 'id')")
    val cons = s.sql("SELECT name, check FROM uqcat.`t$constraints`").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(cons.toSeq === Seq(("pk", "UNIQUE(id)")))
    val e = intercept[Exception](s.sql("INSERT INTO uqcat.t VALUES (2, 'dup')"))
    assert(e.getMessage.contains("pk"), e.getMessage)
    s.sql("ALTER TABLE uqcat.t UNSET TBLPROPERTIES ('unique.pk')")
    s.sql("INSERT INTO uqcat.t VALUES (2, 'dup')")
    assert(s.sql("SELECT count(*) FROM uqcat.t").head().getLong(0) === 3L)
  }
}
