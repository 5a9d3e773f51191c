package graft.sources

import graft.SparkSpec

/** The SQL maintenance surface: CALL graft.system.* drives the lake's
  * lifecycle operations by table name, returns the affected version as
  * a result set, and composes with the rest of the catalog (mirrors are
  * SELECTable, rollbacks time-travel, vacuum ends the window).
  */
class GraftProceduresSpec extends SparkSpec {

  private lazy val root: String = {
    val r = java.nio.file.Files.createTempDirectory("graft_proc").toString
    spark.conf.set("spark.sql.catalog.gproc", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gproc.root", r)
    r
  }

  test("CALL system.replicate bootstraps and syncs a SELECTable mirror") {
    root
    spark.sql("CREATE TABLE gproc.rsrc (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gproc.rsrc VALUES (1, 'a'), (2, 'b')")
    val out = spark.sql(
      "CALL gproc.system.replicate(src => 'rsrc', dst => 'rdst', keys => 'k')")
    assert(out.columns.toSeq === Seq("version"),
      "the procedure returns the affected version")
    assert(spark.sql("SELECT k, v FROM gproc.rdst ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq === Seq((1L, "a"), (2L, "b")))
    spark.sql("UPDATE gproc.rsrc SET v = 'a2' WHERE k = 1")
    spark.sql("DELETE FROM gproc.rsrc WHERE k = 2")
    spark.sql("CALL gproc.system.replicate('rsrc', 'rdst', 'k')")
    assert(spark.sql("SELECT k, v FROM gproc.rdst ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq === Seq((1L, "a2")),
      "SQL DML on the source propagates through the CDC feed")
  }

  test("CALL system.rollback republishes; system.vacuum ends the window") {
    root
    spark.sql("CREATE TABLE gproc.vt (k BIGINT)")
    spark.sql("INSERT INTO gproc.vt VALUES (1)")
    spark.sql("INSERT INTO gproc.vt VALUES (2)")
    spark.sql("CALL gproc.system.rollback('vt', 1)")
    assert(spark.sql("SELECT count(*) FROM gproc.vt").head().getLong(0) === 1L,
      "rollback to the one-row version")
    // vacuum with min_age_ms=0: no in-flight writers in this spec
    spark.sql("CALL gproc.system.vacuum('vt', 1, 0)")
    val e = intercept[Exception](
      spark.sql("SELECT * FROM gproc.vt VERSION AS OF 0").collect())
    assert(e.getMessage.contains("v=0"),
      s"the refusal must be ABOUT the reclaimed manifest v=0: ${e.getMessage}")
    assert(spark.sql("SELECT count(*) FROM gproc.vt").head().getLong(0) === 1L,
      "the live snapshot survives vacuum")
  }

  test("CALL system.optimize compacts; clone_table branches a version") {
    root
    spark.sql("CREATE TABLE gproc.ot (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO gproc.ot VALUES (1, 1.0)")
    spark.sql("INSERT INTO gproc.ot VALUES (2, 2.0)")
    spark.sql("INSERT INTO gproc.ot VALUES (3, 3.0)")
    spark.sql("CALL gproc.system.optimize('ot')")
    assert(spark.sql("SELECT count(*) FROM gproc.`ot$files`").head().getLong(0) === 1L,
      "plain optimize compacts to one directory")
    spark.sql("CALL gproc.system.clone_table('ot', 'ot_branch')")
    spark.sql("INSERT INTO gproc.ot_branch VALUES (9, 9.0)")
    assert(spark.sql("SELECT count(*) FROM gproc.ot_branch").head().getLong(0) === 4L)
    assert(spark.sql("SELECT count(*) FROM gproc.ot").head().getLong(0) === 3L,
      "the branch's writes never touch the source")
  }

  test("CALL system.tag names a version; VERSION AS OF reads it; drop_ref releases it") {
    root
    spark.sql("CREATE TABLE gproc.tg (k BIGINT)")
    spark.sql("INSERT INTO gproc.tg VALUES (1)")
    spark.sql("CALL gproc.system.tag('tg', 'v1-release')") // -1 = current
    spark.sql("INSERT OVERWRITE gproc.tg VALUES (9)")
    spark.sql("INSERT INTO gproc.tg VALUES (10)")
    assert(spark.sql("SELECT k FROM gproc.tg VERSION AS OF 'v1-release'")
      .collect().map(_.getLong(0)).toSeq === Seq(1L))
    // the tag pins its version through vacuum
    spark.sql("CALL gproc.system.vacuum('tg', 1, 0)")
    assert(spark.sql("SELECT k FROM gproc.tg VERSION AS OF 'v1-release'")
      .collect().map(_.getLong(0)).toSeq === Seq(1L),
      "a CALL-created tag must survive CALL-driven vacuum")
    spark.sql("CALL gproc.system.drop_ref('tg', 'v1-release')")
    intercept[Exception](
      spark.sql("SELECT k FROM gproc.tg VERSION AS OF 'v1-release'").collect())
  }

  test("unknown procedures and wrong namespaces refuse loudly") {
    root
    val e1 = intercept[Exception](spark.sql("CALL gproc.system.nonsense()"))
    assert(e1.getMessage.contains("nonsense"))
    // Spark wraps the namespace refusal in FAILED_TO_LOAD_ROUTINE
    val e2 = intercept[Exception](spark.sql("CALL gproc.other.vacuum('x')"))
    assert(e2.getMessage.toLowerCase.contains("failed to load routine"))
  }
}
