package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Declared FOREIGN KEYs with O(delta) child-side enforcement: every
  * insert-family commit anti-joins the batch's non-null keys against
  * only the parent directories the batch's key RANGE overlaps (manifest
  * stats pruning) — ingest-sized cost on a 100 TB parent. MATCH SIMPLE
  * NULL semantics; the parent side is not gated (no reverse pointers) —
  * `verify_constraints` audits that drift. The same declaration the
  * reference reflects out of its RDBMS catalogs, re-expressed as a lake
  * table property.
  */
class FkConstraintSpec extends SparkSpec {

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  test("child inserts probe the parent: missing keys refuse, NULL keys pass, range prunes") {
    val s = spark
    import s.implicits._
    val parent = tmp("fk_parent")
    val child = tmp("fk_child")
    VersionedLake.appendCommit(
      (0L until 100L).map(i => (i, s"p$i")).toDF("pid", "pname"), parent,
      statsCols = Seq("pid"))
    VersionedLake.appendCommit(
      Seq((1L, 5L, "ok")).toDF("id", "fk", "v"), child)
    LakeConstraints.addFk(s, child, "fk_parent", Seq("fk"), parent, Seq("pid"))
    // a valid reference lands
    VersionedLake.appendCommit(Seq((2L, 99L, "ok2")).toDF("id", "fk", "v"), child)
    // a missing parent key refuses, atomically
    val e = intercept[IllegalArgumentException](VersionedLake.appendCommit(
      Seq((3L, 1000L, "orphan")).toDF("id", "fk", "v"), child))
    assert(e.getMessage.contains("fk_parent") && e.getMessage.contains("no parent row"))
    assert(VersionedLake.read(s, child).count() === 2L)
    // NULL keys pass (MATCH SIMPLE)
    VersionedLake.appendCommit(
      Seq((4L, null.asInstanceOf[java.lang.Long], "nullref"))
        .toDF("id", "fk", "v"), child)
    assert(VersionedLake.read(s, child).count() === 3L)
  }

  test("DDL validates existing children; update of an FK column re-probes the POST values") {
    val s = spark
    import s.implicits._
    val parent = tmp("fk_p2")
    val child = tmp("fk_c2")
    VersionedLake.appendCommit(Seq((1L, "p")).toDF("pid", "pname"), parent)
    VersionedLake.appendCommit(Seq((1L, 7L, "orphan")).toDF("id", "fk", "v"), child)
    val e = intercept[IllegalArgumentException](
      LakeConstraints.addFk(s, child, "fk", Seq("fk"), parent, Seq("pid")))
    assert(e.getMessage.contains("existing child rows"), e.getMessage)
    // fix the orphan, declare, then try to update INTO an orphan state
    VersionedLake.updateWhere(s, child, col("id") === 1L, Map("fk" -> lit(1L)))
    LakeConstraints.addFk(s, child, "fk", Seq("fk"), parent, Seq("pid"))
    val e2 = intercept[IllegalArgumentException](VersionedLake.updateWhere(
      s, child, col("id") === 1L, Map("fk" -> lit(42L))))
    assert(e2.getMessage.contains("no parent row"), e2.getMessage)
    // a non-FK assignment is untouched by the probe
    VersionedLake.updateWhere(s, child, col("id") === 1L, Map("v" -> lit("renamed")))
    assert(VersionedLake.read(s, child).head().getString(2) === "renamed")
  }

  test("SQL face: fk.<name> TBLPROPERTIES, t$constraints row, verify_constraints audits parent deletes") {
    val s = spark
    val root = tmp("fk_sql")
    s.conf.set("spark.sql.catalog.fkcat", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.fkcat.root", root)
    s.sql("CREATE TABLE fkcat.dim (pid BIGINT, pname STRING)")
    s.sql("INSERT INTO fkcat.dim VALUES (1, 'a'), (2, 'b')")
    s.sql("CREATE TABLE fkcat.fct (id BIGINT, fk BIGINT)")
    s.sql("INSERT INTO fkcat.fct VALUES (10, 1)")
    s.sql("ALTER TABLE fkcat.fct SET TBLPROPERTIES " +
      "('fk.fct_dim' = 'fk REFERENCES dim (pid)')")
    val cons = s.sql("SELECT name, check FROM fkcat.`fct$constraints`").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(cons.length === 1 && cons.head._1 === "fct_dim" &&
      cons.head._2.startsWith("FOREIGN KEY(fk) REFERENCES"), cons.mkString)
    val e = intercept[Exception](s.sql("INSERT INTO fkcat.fct VALUES (11, 99)"))
    assert(e.getMessage.contains("fct_dim"), e.getMessage)
    s.sql("INSERT INTO fkcat.fct VALUES (12, 2)")
    // zero violations while the parent is intact
    val audit0 = s.sql("CALL fkcat.system.verify_constraints('fct')").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(audit0.toSeq === Seq(("fct_dim", "fk", 0L)))
    // a parent delete orphans a child: the commit gate cannot see it
    // (no reverse pointers), the audit reports it
    s.sql("DELETE FROM fkcat.dim WHERE pid = 2")
    val audit1 = s.sql("CALL fkcat.system.verify_constraints('fct')").collect()
      .map(r => (r.getString(0), r.getLong(2)))
    assert(audit1.toSeq === Seq(("fct_dim", 1L)),
      s"the orphaned child must surface in the audit: ${audit1.toSeq}")
  }

  test("ON DELETE RESTRICT: referenced-key delete refuses, unreferenced commits, audit stays green") {
    val s = spark
    import s.implicits._
    val parent = tmp("fkr_parent")
    val child = tmp("fkr_child")
    VersionedLake.appendCommit(
      (0L until 100L).map(i => (i, s"p$i")).toDF("pid", "pname"), parent,
      statsCols = Seq("pid"))
    VersionedLake.appendCommit(
      Seq((1L, 5L), (2L, 7L)).toDF("id", "fk"), child, statsCols = Seq("fk"))
    LakeConstraints.addFk(s, child, "fk_par", Seq("fk"), parent, Seq("pid"),
      restrict = true)
    // deleting a referenced parent key refuses, atomically
    val e = intercept[IllegalArgumentException](
      VersionedLake.deleteWhere(s, parent, col("pid") === 5L))
    assert(e.getMessage.contains("RESTRICT") && e.getMessage.contains("fk_par"),
      e.getMessage)
    assert(VersionedLake.read(s, parent).count() === 100L, "refused delete must not publish")
    // deleting an unreferenced key commits; MoR delete is gated the same way
    VersionedLake.deleteWhere(s, parent, col("pid") === 50L)
    intercept[IllegalArgumentException](
      VersionedLake.deleteWhereMor(s, parent, col("pid") === 7L))
    VersionedLake.deleteWhereMor(s, parent, col("pid") === 51L)
    assert(VersionedLake.read(s, parent).count() === 98L)
    // update NOT touching the key passes; update that rewrites a
    // referenced key away refuses
    VersionedLake.materializeDeletes(s, parent)
    VersionedLake.updateWhere(s, parent, col("pid") === 5L,
      Map("pname" -> lit("renamed")))
    intercept[IllegalArgumentException](
      VersionedLake.updateWhere(s, parent, col("pid") === 5L,
        Map("pid" -> lit(500L))))
    // the audit never saw an orphan
    assert(LakeConstraints.verifyAll(s, child).forall(_._3 === 0L))
    assert(LakeConstraints.verifyAll(s, parent).forall(_._3 === 0L))
    // dropping the FK revokes the parent-side gate with it
    LakeConstraints.drop(s, child, "fk_par")
    assert(LakeConstraints.restrictsOf(s, parent).isEmpty,
      "dropping the FK must revoke the reverse pointer")
    VersionedLake.deleteWhere(s, parent, col("pid") === 5L)
    assert(VersionedLake.read(s, parent).count() === 97L)
  }

  test("RESTRICT via SQL: ON DELETE RESTRICT property, gated DELETE, t$constraints row") {
    val s = spark
    val root = tmp("fkr_cat")
    s.conf.set("spark.sql.catalog.fkrcat", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.fkrcat.root", root)
    s.sql("CREATE TABLE fkrcat.dim (pid BIGINT, nm STRING) TBLPROPERTIES('stats.cols'='pid')")
    s.sql("INSERT INTO fkrcat.dim VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    s.sql("CREATE TABLE fkrcat.fct (id BIGINT, pid BIGINT) " +
      "TBLPROPERTIES('stats.cols'='pid', " +
      "'fk.fd'='pid REFERENCES dim (pid) ON DELETE RESTRICT')")
    s.sql("INSERT INTO fkrcat.fct VALUES (10, 1)")
    val e = intercept[Exception](s.sql("DELETE FROM fkrcat.dim WHERE pid = 1"))
    assert(e.getMessage.contains("RESTRICT"), e.getMessage)
    s.sql("DELETE FROM fkrcat.dim WHERE pid = 3")
    assert(s.sql("SELECT count(*) FROM fkrcat.dim").head().getLong(0) === 2L)
    val rows = s.sql("SELECT name, check FROM fkrcat.`dim$constraints`").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows.exists { case (n, c) => n.startsWith("fd@") && c.startsWith("RESTRICT") },
      s"parent must list the reverse pointer: $rows")
  }

  test("RESTRICT gates keyed upserts: a rekey away from a referenced value refuses") {
    val s = spark
    import s.implicits._
    val parent = tmp("fkr_up_parent")
    val child = tmp("fkr_up_child")
    // parent keyed by id; the FK references the EMAIL column, so an
    // upsert-by-id can rewrite the referenced value (the rekey shape)
    VersionedLake.appendCommit(
      Seq((1L, "a@x"), (2L, "b@x"), (3L, "c@x")).toDF("id", "email"), parent,
      statsCols = Seq("id", "email"))
    VersionedLake.appendCommit(
      Seq((10L, "a@x")).toDF("cid", "ref_email"), child, statsCols = Seq("ref_email"))
    LakeConstraints.addFk(s, child, "em_fk", Seq("ref_email"), parent, Seq("email"),
      restrict = true)
    // rekeying the referenced email away refuses (CoW upsert)
    val e = intercept[IllegalArgumentException](
      VersionedLake.upsert(s, parent, Seq((1L, "a2@x")).toDF("id", "email"),
        keys = Seq("id")))
    assert(e.getMessage.contains("RESTRICT"), e.getMessage)
    // rekeying an UNREFERENCED email commits; re-supplying the same
    // referenced value commits (nothing leaves)
    VersionedLake.upsert(s, parent, Seq((2L, "b2@x")).toDF("id", "email"),
      keys = Seq("id"))
    VersionedLake.upsert(s, parent, Seq((1L, "a@x")).toDF("id", "email"),
      keys = Seq("id"))
    // the MoR twin gates the same way, before any artifact lands
    intercept[IllegalArgumentException](
      VersionedLake.upsertMor(s, parent, Seq((1L, "a3@x")).toDF("id", "email"),
        keys = Seq("id")))
    VersionedLake.upsertMor(s, parent, Seq((3L, "c2@x")).toDF("id", "email"),
      keys = Seq("id"))
    assert(VersionedLake.read(s, parent).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "a@x"), (2L, "b2@x"), (3L, "c2@x")))
    assert(LakeConstraints.verifyAll(s, child).forall(_._3 === 0L))
  }
}
