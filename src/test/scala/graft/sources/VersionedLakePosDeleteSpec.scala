package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MERGE-ON-READ POSITION DELETES (deleteWhereMor): the keyless O(delta)
  * delete — one position file, zero data rewritten, read-side anti-join
  * on the scan's own metadata row identity.
  */
class VersionedLakePosDeleteSpec extends SparkSpec {

  private def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString

  test("predicate delete writes positions only: zero data rewrite, exact reads") {
    val s = spark
    import s.implicits._
    val dir = tmp("vlake_pos")
    VersionedLake.appendCommit(
      (1L to 100L).map(i => (i, s"p${i % 7}")).toDF("id", "payload"), dir)
    VersionedLake.appendCommit(
      (101L to 200L).map(i => (i, s"p${i % 7}")).toDF("id", "payload"), dir)
    val beforeDirs = VersionedLake.manifest(s, dir, 1)
    val v = VersionedLake.deleteWhereMor(s, dir, col("payload") === "p3")
    assert(v === 2L)
    // ZERO rewrite: the new version references exactly the old directories
    assert(VersionedLake.manifest(s, dir, v) === beforeDirs)
    val got = VersionedLake.read(s, dir).select("id").collect().map(_.getLong(0)).toSet
    val want = (1L to 200L).filterNot(i => i % 7 === 3).toSet
    assert(got === want)
    // time travel: the pre-delete version still holds everything
    assert(VersionedLake.readVersion(s, dir, 1).count() === 200L)
  }

  test("keyless tables with DUPLICATE rows: matched physical rows vanish; " +
    "later re-inserts survive the pinned scope") {
    val s = spark
    import s.implicits._
    val dir = tmp("vlake_pos_dup")
    // no unique key: the same row twice — equality deletes cannot express
    // "delete these two physical rows" without nuking re-inserts too
    VersionedLake.appendCommit(
      Seq(("a", 1L), ("a", 1L), ("b", 2L)).toDF("k", "v"), dir)
    VersionedLake.deleteWhereMor(s, dir, col("k") === "a")
    assert(VersionedLake.read(s, dir).collect().map(_.getString(0)).toSeq === Seq("b"))
    // a re-insert of the same VALUES lands outside the delete's scope
    VersionedLake.appendCommit(Seq(("a", 1L)).toDF("k", "v"), dir)
    val got = VersionedLake.read(s, dir).collect().map(_.getString(0)).sorted
    assert(got.toSeq === Seq("a", "b"))
  }

  test("stacks with keyed MoR commits; CoW rewrites refuse while pending; " +
    "materializeDeletes folds everything") {
    val s = spark
    import s.implicits._
    val dir = tmp("vlake_pos_stack")
    VersionedLake.appendCommit(
      (1L to 50L).map(i => (i, i * 10L)).toDF("id", "v"), dir)
    VersionedLake.deleteWhereMor(s, dir, col("id") <= 5L)
    // a keyed MoR upsert stacks on top of the pending position delete
    VersionedLake.upsertMor(s, dir, Seq((10L, 999L), (51L, 510L)).toDF("id", "v"), Seq("id"))
    val got = VersionedLake.read(s, dir).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!got.contains(3L) && got(10L) === 999L && got(51L) === 510L && got(20L) === 200L)
    // CoW rewrites refuse while deletes are pending
    val e = intercept[IllegalArgumentException](
      VersionedLake.deleteKeys(s, dir, Seq(20L).toDF("id"), Seq("id")))
    assert(e.getMessage.contains("pending merge-on-read deletes"))
    // materialization folds both kinds and returns reads to plain scans
    val mv = VersionedLake.materializeDeletes(s, dir)
    assert(VersionedLake.dirEqDeletes(s, dir, mv).isEmpty)
    val after = VersionedLake.read(s, dir).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after === got)
  }

  test("CDC: the artifact carries exactly the newly-deleted rows; " +
    "an overlapping second delete reports no duplicates") {
    val s = spark
    import s.implicits._
    val dir = tmp("vlake_pos_cdc")
    VersionedLake.appendCommit(
      (1L to 30L).map(i => (i, s"g${i % 3}")).toDF("id", "g"), dir)
    val v1 = VersionedLake.deleteWhereMor(s, dir, col("g") === "g1")
    val d1 = VersionedLake.readRowChanges(s, dir, v1 - 1, v1)
    assert(d1.filter(col("_change_type") === "delete").select("id")
      .collect().map(_.getLong(0)).toSet === (1L to 30L).filter(_ % 3 == 1).toSet)
    // the second predicate overlaps the first: already-deleted rows are
    // not logical rows anymore, so they must not re-report as deletes
    val v2 = VersionedLake.deleteWhereMor(s, dir, col("g") =!= "g0")
    val d2 = VersionedLake.readRowChanges(s, dir, v2 - 1, v2)
    assert(d2.filter(col("_change_type") === "delete").select("id")
      .collect().map(_.getLong(0)).toSet === (1L to 30L).filter(_ % 3 == 2).toSet)
  }

  test("hive-partitioned layout: positions address files under k=v levels") {
    val s = spark
    import s.implicits._
    val dir = tmp("vlake_pos_hive")
    VersionedLake.commit(
      (1L to 40L).map(i => (i, s"d${i % 4}")).toDF("id", "p"), dir, parts = Seq("p"))
    VersionedLake.deleteWhereMor(s, dir, col("id") % 10 === 0)
    val got = VersionedLake.read(s, dir).select("id").collect().map(_.getLong(0)).toSet
    assert(got === (1L to 40L).filterNot(_ % 10 == 0).toSet)
    // partition pruning still answers correctly through the pending delete
    assert(VersionedLake.read(s, dir).filter(col("p") === "d1")
      .select("id").collect().map(_.getLong(0)).toSet ===
      (1L to 40L).filter(i => i % 4 == 1 && i % 10 != 0).toSet)
  }

  test("no-match delete commits nothing; txn advances metadata-only; replay no-ops") {
    val s = spark
    import s.implicits._
    val dir = tmp("vlake_pos_txn")
    VersionedLake.appendCommit(Seq((1L, "a")).toDF("id", "v"), dir)
    val base = VersionedLake.currentVersion(s, dir).get
    assert(VersionedLake.deleteWhereMor(s, dir, col("id") > 100L) === base)
    val v1 = VersionedLake.deleteWhereMor(s, dir, col("id") > 100L,
      txn = Some("pdel" -> 1L))
    assert(v1 === base + 1,
      "a no-match delete with a txn advances the watermark metadata-only")
    assert(VersionedLake.manifest(s, dir, v1) === VersionedLake.manifest(s, dir, base))
    // replay of an applied batch no-ops
    assert(VersionedLake.deleteWhereMor(s, dir, col("id") === 1L,
      txn = Some("pdel" -> 1L)) === v1)
    assert(VersionedLake.read(s, dir).count() === 1L)
  }

  test("TBLPROPERTIES('delete.mode'='merge-on-read'): SQL DELETE takes the " +
    "position path, zero rewrite; unset returns to CoW") {
    val s = spark
    val root = tmp("vlake_pos_mode")
    s.conf.set("spark.sql.catalog.gpmode", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.gpmode.root", root)
    s.sql("""CREATE TABLE gpmode.t (id BIGINT, v STRING)
            |TBLPROPERTIES ('delete.mode'='merge-on-read')""".stripMargin)
    s.sql("INSERT INTO gpmode.t VALUES (1, 'a'), (2, 'b'), (3, 'c'), (4, 'd')")
    val dir = s"$root/t"
    val beforeDirs = VersionedLake.manifest(s, dir,
      VersionedLake.currentVersion(s, dir).get)
    s.sql("DELETE FROM gpmode.t WHERE id >= 3")
    val cur = VersionedLake.currentVersion(s, dir).get
    assert(VersionedLake.manifest(s, dir, cur) === beforeDirs,
      "MoR mode: the delete must not rewrite any data directory")
    assert(VersionedLake.dirEqDeletes(s, dir, cur).exists(VersionedLake.isPosDelete),
      "the pending delete is a position file")
    assert(s.sql("SELECT id FROM gpmode.t ORDER BY id").collect().map(_.getLong(0)).toSeq
      === Seq(1L, 2L))
    // the subquery DELETE path honors the mode too
    s.sql("CREATE OR REPLACE TEMP VIEW pm_del AS SELECT CAST(2 AS BIGINT) AS id")
    s.sql("DELETE FROM gpmode.t WHERE id IN (SELECT id FROM pm_del)")
    val cur2 = VersionedLake.currentVersion(s, dir).get
    assert(VersionedLake.manifest(s, dir, cur2) === beforeDirs)
    assert(s.sql("SELECT id FROM gpmode.t").collect().map(_.getLong(0)).toSeq === Seq(1L))
    // back to copy-on-write: materialize first (CoW refuses over pending
    // deletes), unset the mode, and the next DELETE rewrites
    VersionedLake.materializeDeletes(s, dir)
    s.sql("ALTER TABLE gpmode.t UNSET TBLPROPERTIES ('delete.mode')")
    s.sql("DELETE FROM gpmode.t WHERE id = 1")
    val cur3 = VersionedLake.currentVersion(s, dir).get
    assert(VersionedLake.dirEqDeletes(s, dir, cur3).isEmpty,
      "CoW mode publishes no pending delete")
    assert(s.sql("SELECT count(*) FROM gpmode.t").head().getLong(0) === 0L)
  }

  test("updateWhereMor: positions + appended rows, zero rewrite, pre-image semantics") {
    val s = spark
    import s.implicits._
    val dir = tmp("vlake_pos_upd")
    VersionedLake.appendCommit(
      (1L to 60L).map(i => (i, i * 10L, s"s${i % 3}")).toDF("id", "v", "st"), dir)
    val beforeDirs = VersionedLake.manifest(s, dir, 0)
    val v = VersionedLake.updateWhereMor(s, dir, col("st") === "s1",
      Map("v" -> (col("v") + col("id")), "st" -> lit("X")))
    // zero rewrite: old dirs carry verbatim, ONE appended dir
    val nowDirs = VersionedLake.manifest(s, dir, v)
    assert(nowDirs.take(beforeDirs.size) === beforeDirs && nowDirs.size === beforeDirs.size + 1)
    val got = VersionedLake.read(s, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    (1L to 60L).foreach { i =>
      if (i % 3 == 1) assert(got(i) === ((i * 10 + i, "X")), s"row $i must update")
      else assert(got(i) === ((i * 10, s"s${i % 3}")), s"row $i must carry")
    }
    // pre-update snapshot time-travels
    assert(VersionedLake.readVersion(s, dir, 0).filter(col("st") === "X").count() === 0L)
    // CDC: pre/postimages are exactly the matched rows
    val d = VersionedLake.readRowChanges(s, dir, v - 1, v)
    assert(d.filter(col("_change_type") === "update_preimage").count() === 20L)
    assert(d.filter(col("_change_type") === "update_postimage")
      .filter(col("st") === "X").count() === 20L)
    // a second MoR update stacks; materialization folds both
    VersionedLake.updateWhereMor(s, dir, col("id") === 1L, Map("st" -> lit("Y")))
    val mv = VersionedLake.materializeDeletes(s, dir)
    assert(VersionedLake.dirEqDeletes(s, dir, mv).isEmpty)
    assert(VersionedLake.read(s, dir).filter(col("id") === 1L)
      .head().getString(2) === "Y")
    assert(VersionedLake.read(s, dir).count() === 60L)
  }

  test("TBLPROPERTIES('update.mode'='merge-on-read'): SQL UPDATE appends, never rewrites") {
    val s = spark
    val root = tmp("vlake_pos_umode")
    s.conf.set("spark.sql.catalog.gpum", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.gpum.root", root)
    s.sql("""CREATE TABLE gpum.t (id BIGINT, v BIGINT)
            |TBLPROPERTIES ('update.mode'='merge-on-read')""".stripMargin)
    s.sql("INSERT INTO gpum.t VALUES (1, 10), (2, 20), (3, 30)")
    val dir = s"$root/t"
    val before = VersionedLake.manifest(s, dir, VersionedLake.currentVersion(s, dir).get)
    s.sql("UPDATE gpum.t SET v = v + 1 WHERE id <= 2")
    val cur = VersionedLake.currentVersion(s, dir).get
    assert(VersionedLake.manifest(s, dir, cur).take(before.size) === before,
      "MoR mode: prior directories carry verbatim")
    assert(VersionedLake.dirEqDeletes(s, dir, cur).exists(VersionedLake.isPosDelete))
    assert(s.sql("SELECT v FROM gpum.t ORDER BY id").collect().map(_.getLong(0)).toSeq
      === Seq(11L, 21L, 30L))
    // subquery UPDATE honors the mode too
    s.sql("CREATE OR REPLACE TEMP VIEW um_allow AS SELECT CAST(3 AS BIGINT) AS id")
    s.sql("UPDATE gpum.t SET v = v * 2 WHERE id IN (SELECT id FROM um_allow)")
    assert(s.sql("SELECT v FROM gpum.t ORDER BY id").collect().map(_.getLong(0)).toSeq
      === Seq(11L, 21L, 60L))
  }

  test("catalog SQL reads route through the pending position delete") {
    val s = spark
    import s.implicits._
    val root = tmp("vlake_pos_cat")
    s.conf.set("spark.sql.catalog.gpos", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.gpos.root", root)
    s.sql("CREATE TABLE gpos.t (id BIGINT, v STRING)")
    s.sql("INSERT INTO gpos.t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    VersionedLake.deleteWhereMor(s, s"$root/t", col("v") === "b")
    assert(s.sql("SELECT id FROM gpos.t ORDER BY id").collect().map(_.getLong(0)).toSeq
      === Seq(1L, 3L))
  }
}
