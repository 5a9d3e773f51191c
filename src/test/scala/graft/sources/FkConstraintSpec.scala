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

  test("clone with parentMap: a cloned child+parent pair enforces INSIDE the clone set") {
    val s = spark
    import s.implicits._
    val parent = tmp("fkc_parent")
    val child = tmp("fkc_child")
    VersionedLake.appendCommit(
      (0L until 50L).map(i => (i, s"p$i")).toDF("pid", "pname"), parent,
      statsCols = Seq("pid"))
    VersionedLake.appendCommit(
      Seq((1L, 5L, "r1"), (2L, 7L, "r2")).toDF("id", "fk", "v"), child,
      statsCols = Seq("fk"))
    LakeConstraints.addFk(s, child, "fk_p", Seq("fk"), parent, Seq("pid"),
      restrict = true)
    // clone BOTH tables with the same map, child first (order-free)
    val parent2 = tmp("fkc_parent2")
    val child2 = tmp("fkc_child2")
    val pm = Map(parent -> parent2, child -> child2)
    VersionedLake.cloneTable(s, child, child2, parentMap = pm)
    VersionedLake.cloneTable(s, parent, parent2, parentMap = pm)
    // the cloned child's FK points at the CLONED parent: delete a key
    // from the cloned parent only, then an insert referencing it refuses
    VersionedLake.deleteWhere(s, parent2, col("pid") === 40L)
    val e = intercept[IllegalArgumentException](VersionedLake.appendCommit(
      Seq((3L, 40L, "orphan")).toDF("id", "fk", "v"), child2))
    assert(e.getMessage.contains("no parent row"), e.getMessage)
    // ...while the SOURCE child still accepts it (its parent keeps 40)
    VersionedLake.appendCommit(Seq((3L, 40L, "ok")).toDF("id", "fk", "v"), child)
    // the RESTRICT reverse pointer remapped too: deleting a key the
    // CLONED child references refuses on the CLONED parent...
    val r = intercept[IllegalArgumentException](
      VersionedLake.deleteWhere(s, parent2, col("pid") === 5L))
    assert(r.getMessage.contains("RESTRICT"), r.getMessage)
    // ...and names the cloned child, never the source tables
    assert(r.getMessage.contains(child2) && !r.getMessage.contains(child + "("),
      r.getMessage)
    // the declarations resolve inside the clone set only
    assert(LakeConstraints.fksOf(s, child2).head._2._2 === parent2)
    assert(LakeConstraints.restrictsOf(s, parent2).head._2._1 === child2)
    // dropping the clone's FK revokes the clone parent's pointer, not
    // the source's
    LakeConstraints.drop(s, child2, "fk_p")
    assert(LakeConstraints.restrictsOf(s, parent2).isEmpty)
    assert(LakeConstraints.restrictsOf(s, parent).nonEmpty)
  }

  test("clone WITHOUT a map: restrict downgrades to a plain FK, a cloned parent drops the foreign pointer") {
    val s = spark
    import s.implicits._
    val parent = tmp("fkn_parent")
    val child = tmp("fkn_child")
    VersionedLake.appendCommit(
      (0L until 20L).map(i => (i, s"p$i")).toDF("pid", "pname"), parent,
      statsCols = Seq("pid"))
    VersionedLake.appendCommit(
      Seq((1L, 5L, "r1")).toDF("id", "fk", "v"), child, statsCols = Seq("fk"))
    LakeConstraints.addFk(s, child, "fk_p", Seq("fk"), parent, Seq("pid"),
      restrict = true)
    // cloned CHILD alone: the FK carries against the live source parent
    // but RESTRICT downgrades (the source parent's pointer names the
    // source child only — carrying `restrict` would declare an
    // enforcement nothing performs)
    val child2 = tmp("fkn_child2")
    VersionedLake.cloneTable(s, child, child2)
    val Seq((_, (_, pdir, _))) = LakeConstraints.fksOf(s, child2)
    assert(pdir === parent, "an unmapped cross FK keeps validating against the source parent")
    // downgraded: no reverse pointer anywhere names the clone
    assert(LakeConstraints.restrictsOf(s, parent).forall(_._2._1 != child2),
      "an unmapped restrict FK must downgrade - no pointer may name the clone")
    intercept[IllegalArgumentException](VersionedLake.appendCommit(
      Seq((9L, 999L, "orphan")).toDF("id", "fk", "v"), child2))
    // cloned PARENT alone: the foreign RestrictDecl is DROPPED — the
    // clone's deletes are not gated by a child it doesn't own
    val parent2 = tmp("fkn_parent2")
    VersionedLake.cloneTable(s, parent, parent2)
    assert(LakeConstraints.restrictsOf(s, parent2).isEmpty)
    VersionedLake.deleteWhere(s, parent2, col("pid") === 5L) // must commit
    // the source pair still enforces
    intercept[IllegalArgumentException](
      VersionedLake.deleteWhere(s, parent, col("pid") === 5L))
  }
}
