package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Table-level properties: the `cdc.artifacts` opt-out gates the CoW
  * change-artifact write per TABLE (SQL DML has no per-call knob), and
  * the property round-trips through TBLPROPERTIES.
  */
class LakePropsSpec extends SparkSpec {

  test("cdc.artifacts=false skips the artifact; the feed refuses that window") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("props_cdc").toString
    VersionedLake.appendCommit(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir)
    LakeProps.set(s, dir, "cdc.artifacts", "false")
    VersionedLake.upsert(s, dir, Seq((1L, "a2")).toDF("k", "v"), keys = Seq("k"))
    val cur = VersionedLake.currentVersion(s, dir).get
    assert(VersionedLake.changesArtifact(s, dir, cur).isEmpty,
      "a feedless table must not pay the artifact read+write per commit")
    // the window is honestly unreplayable now — loud, not silent
    val e = intercept[IllegalStateException](
      VersionedLake.readRowChanges(s, dir, 0, cur).collect())
    assert(e.getMessage.contains("change artifact"))
    // flipping it back restores the artifact on the NEXT commit
    LakeProps.unset(s, dir, "cdc.artifacts")
    VersionedLake.upsert(s, dir, Seq((2L, "b2")).toDF("k", "v"), keys = Seq("k"))
    val cur2 = VersionedLake.currentVersion(s, dir).get
    assert(VersionedLake.changesArtifact(s, dir, cur2).isDefined)
  }

  test("concurrent different-key updates both survive (CAS, not read-modify-replace)") {
    val s = spark
    val dir = java.nio.file.Files.createTempDirectory("props_cas").toString
    // hammer two keys from racing threads: under the old unguarded
    // get-then-atomicWrite, one side's update is routinely lost
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val fa = pool.submit(new Runnable {
        def run(): Unit =
          (1 to 20).foreach(i => LakeProps.set(s, dir, "a", i.toString))
      })
      val fb = pool.submit(new Runnable {
        def run(): Unit =
          (1 to 20).foreach(i => LakeProps.set(s, dir, "b", i.toString))
      })
      fa.get(); fb.get()
    } finally pool.shutdown()
    val got = LakeProps.get(s, dir)
    assert(got.get("a").contains("20") && got.get("b").contains("20"),
      s"both writers' final values must land: $got")
  }

  test("legacy single-file props.txt reads as generation 0 and upgrades on first mutation") {
    val s = spark
    val dir = java.nio.file.Files.createTempDirectory("props_legacy").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "props.txt"),
      """{"old.key":"kept"}""".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(LakeProps.get(s, dir) === Map("old.key" -> "kept"))
    LakeProps.set(s, dir, "new.key", "v")
    assert(LakeProps.get(s, dir) === Map("old.key" -> "kept", "new.key" -> "v"),
      "the legacy map must carry into the first CAS generation")
    LakeProps.unset(s, dir, "old.key")
    assert(LakeProps.get(s, dir) === Map("new.key" -> "v"))
  }

  test("TBLPROPERTIES('cdc.artifacts'='false') reaches SQL DML and SHOW TBLPROPERTIES") {
    val s = spark
    val root = java.nio.file.Files.createTempDirectory("props_cat").toString
    spark.conf.set("spark.sql.catalog.gprop", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gprop.root", root)
    spark.sql("""CREATE TABLE gprop.t (k BIGINT, v STRING)
                |TBLPROPERTIES ('cdc.artifacts'='false')""".stripMargin)
    spark.sql("INSERT INTO gprop.t VALUES (1, 'a'), (2, 'b')")
    spark.sql("UPDATE gprop.t SET v = 'x' WHERE k = 1")
    val cur = VersionedLake.currentVersion(s, s"$root/t").get
    assert(VersionedLake.changesArtifact(s, s"$root/t", cur).isEmpty,
      "SQL UPDATE on an opted-out table must not publish an artifact")
    val props = spark.sql("SHOW TBLPROPERTIES gprop.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("cdc.artifacts").contains("false"))
    spark.sql("ALTER TABLE gprop.t UNSET TBLPROPERTIES ('cdc.artifacts')")
    spark.sql("UPDATE gprop.t SET v = 'y' WHERE k = 2")
    val cur2 = VersionedLake.currentVersion(s, s"$root/t").get
    assert(VersionedLake.changesArtifact(s, s"$root/t", cur2).isDefined,
      "unsetting the property restores artifacts for later DML")
  }
}
