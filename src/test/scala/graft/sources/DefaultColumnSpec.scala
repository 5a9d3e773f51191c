package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ADD COLUMN ... DEFAULT as a METADATA-ONLY operation: the default
  * rides the committed schema's field metadata (Spark's own
  * CURRENT_DEFAULT / EXISTS_DEFAULT keys), so INSERTs omitting the
  * column fill the current default at write, files predating the column
  * fill the existence default at read (stock parquet-reader machinery,
  * both scan paths), and a 100 TB table gains a defaulted column with
  * ZERO data movement — the backfill that never happens.
  */
class DefaultColumnSpec extends SparkSpec {

  private lazy val root: String = {
    val r = java.nio.file.Files.createTempDirectory("graft_dflt").toString
    spark.conf.set("spark.sql.catalog.gdflt", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdflt.root", r)
    r
  }

  test("ADD COLUMN DEFAULT: old files read the default, new inserts fill it, explicit values win") {
    root
    spark.sql("CREATE TABLE gdflt.t (id BIGINT, v STRING)")
    spark.sql("INSERT INTO gdflt.t VALUES (1, 'a'), (2, 'b')")
    val dirsBefore = VersionedLake.manifest(spark, s"$root/t",
      VersionedLake.currentVersion(spark, s"$root/t").get)
    spark.sql("ALTER TABLE gdflt.t ADD COLUMN score BIGINT DEFAULT 42")
    val cur = VersionedLake.currentVersion(spark, s"$root/t").get
    assert(VersionedLake.manifest(spark, s"$root/t", cur).startsWith(dirsBefore),
      "every pre-existing directory carries VERBATIM (the add is an empty " +
        "schema-carrier commit) - zero data movement")
    // pre-existing rows read the EXISTENCE default, not null
    assert(spark.sql("SELECT id, score FROM gdflt.t ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 42L), (2L, 42L)))
    // an INSERT omitting the column fills the CURRENT default
    spark.sql("INSERT INTO gdflt.t (id, v) VALUES (3, 'c')")
    // an INSERT supplying it wins
    spark.sql("INSERT INTO gdflt.t VALUES (4, 'd', 7)")
    assert(spark.sql("SELECT id, score FROM gdflt.t ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 42L), (2L, 42L), (3L, 42L), (4L, 7L)))
    // filters see the filled values (both the pruned scan and post-scan)
    assert(spark.sql("SELECT count(*) FROM gdflt.t WHERE score = 42")
      .head().getLong(0) === 3L)
  }

  test("defaults survive the per-directory bridge (MoR pending deletes) and time travel") {
    root
    spark.sql("CREATE TABLE gdflt.m (id BIGINT, v STRING)")
    spark.sql("INSERT INTO gdflt.m VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    spark.sql("ALTER TABLE gdflt.m ADD COLUMN flag STRING DEFAULT 'on'")
    // route reads through the MoR read-through bridge: a pending
    // equality delete forces the V1 per-directory path
    val dir = s"$root/m"
    val s2 = spark
    import s2.implicits._
    VersionedLake.deleteKeysMor(spark, dir, Seq(2L).toDF("id"), Seq("id"))
    assert(spark.sql("SELECT id, flag FROM gdflt.m ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "on"), (3L, "on")),
      "existence defaults must fill on the read-through bridge too")
    // the pre-ADD version time-travels WITHOUT the column
    assert(!spark.sql("SELECT * FROM gdflt.m VERSION AS OF 1").columns.contains("flag"))
    // a defaulted column refuses rename (variant-coalesce would shadow
    // legit NULLs with the existence default on the bridge)
    val e = intercept[Exception](
      spark.sql("ALTER TABLE gdflt.m RENAME COLUMN flag TO enabled"))
    assert(e.getMessage.contains("DEFAULT"), e.getMessage)
  }

  test("ALTER COLUMN SET/DROP DEFAULT changes future inserts only; history untouched") {
    root
    spark.sql("CREATE TABLE gdflt.sd (id BIGINT, v STRING)")
    spark.sql("INSERT INTO gdflt.sd VALUES (1, 'a')")
    spark.sql("ALTER TABLE gdflt.sd ADD COLUMN tier STRING DEFAULT 'bronze'")
    spark.sql("INSERT INTO gdflt.sd (id, v) VALUES (2, 'b')")
    // retarget the CURRENT default: future inserts fill the new value,
    // the pre-column row keeps its EXISTENCE default, row 2 keeps its
    // written value
    spark.sql("ALTER TABLE gdflt.sd ALTER COLUMN tier SET DEFAULT 'silver'")
    spark.sql("INSERT INTO gdflt.sd (id, v) VALUES (3, 'c')")
    spark.sql("ALTER TABLE gdflt.sd ALTER COLUMN tier DROP DEFAULT")
    spark.sql("INSERT INTO gdflt.sd (id, v) VALUES (4, 'd')")
    assert(spark.sql("SELECT id, tier FROM gdflt.sd ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "bronze"), (2L, "bronze"), (3L, "silver"), (4L, null)))
  }

  test("library appends omitting the column read the existence default; optimize materializes") {
    root
    spark.sql("CREATE TABLE gdflt.l (id BIGINT)")
    spark.sql("INSERT INTO gdflt.l VALUES (1)")
    spark.sql("ALTER TABLE gdflt.l ADD COLUMN tag STRING DEFAULT 'x'")
    val dir = s"$root/l"
    val s2 = spark
    import s2.implicits._
    // a library append that never heard of the column: union-by-name
    // evolution, the file lacks it, the read fills the default
    VersionedLake.appendCommit(Seq(2L).toDF("id"), dir)
    assert(spark.sql("SELECT id, tag FROM gdflt.l ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "x"), (2L, "x")))
    // a full optimize MATERIALIZES the filled values into the data
    VersionedLake.optimize(spark, dir)
    assert(spark.sql("SELECT id, tag FROM gdflt.l ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "x"), (2L, "x")))
  }
}
