package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CHECK constraints as a table property: declared once, enforced on
  * every ingest path, SQL NULL semantics, snapshot-validated at DDL
  * time — and invisible to paths that only remove rows.
  */
class LakeConstraintsSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("append path: violating batch refused, table unchanged; passing batch lands") {
    val s = spark
    import s.implicits._
    val dir = tmp("lc_app")
    VersionedLake.appendCommit(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "price"), dir)
    LakeConstraints.add(s, dir, "price_pos", "price > 0")
    val e = intercept[IllegalArgumentException](
      VersionedLake.appendCommit(Seq((3L, -5.0)).toDF("id", "price"), dir))
    assert(e.getMessage.contains("price_pos") && e.getMessage.contains("1 row(s)"))
    assert(VersionedLake.currentVersion(s, dir).contains(0L), "refused commit must not publish")
    VersionedLake.appendCommit(Seq((3L, 5.0)).toDF("id", "price"), dir)
    assert(VersionedLake.read(s, dir).count() === 3)
  }

  test("NULL passes (SQL CHECK), and a batch omitting the constrained column passes") {
    val s = spark
    import s.implicits._
    val dir = tmp("lc_null")
    VersionedLake.appendCommit(Seq((1L, Some(10.0))).toDF("id", "price"), dir)
    LakeConstraints.add(s, dir, "price_pos", "price > 0")
    // explicit NULL price: unknown, not false -> passes
    VersionedLake.appendCommit(Seq((2L, Option.empty[Double])).toDF("id", "price"), dir)
    // schema-evolution batch without the column at all -> reads back NULL -> passes
    VersionedLake.appendCommit(Seq(Tuple1(3L)).toDF("id"), dir)
    assert(VersionedLake.read(s, dir).count() === 3)
  }

  test("ADD CONSTRAINT validates existing rows and refuses a violating table") {
    val s = spark
    import s.implicits._
    val dir = tmp("lc_ddl")
    VersionedLake.appendCommit(Seq((1L, -1.0)).toDF("id", "price"), dir)
    val e = intercept[IllegalArgumentException](
      LakeConstraints.add(s, dir, "price_pos", "price > 0"))
    assert(e.getMessage.contains("existing rows"))
    assert(LakeConstraints.constraintsOf(s, dir).isEmpty, "refused DDL must not persist")
  }

  test("upsert and updateWhere enforce on the post-image; deletes don't care") {
    val s = spark
    import s.implicits._
    val dir = tmp("lc_dml")
    VersionedLake.appendCommit(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "price"), dir,
      statsCols = Seq("id"))
    LakeConstraints.add(s, dir, "price_pos", "price > 0")
    intercept[IllegalArgumentException](
      VersionedLake.upsert(s, dir, Seq((2L, -9.0)).toDF("id", "price"), Seq("id")))
    intercept[IllegalArgumentException](
      VersionedLake.updateWhere(s, dir, col("id") === 1L, Map("price" -> lit(-1.0))))
    assert(VersionedLake.read(s, dir).agg(min("price")).head().getDouble(0) > 0,
      "refused DML must leave every row satisfying the constraint")
    // a delete removes rows; nothing to check
    VersionedLake.deleteWhere(s, dir, col("id") === 1L)
    assert(VersionedLake.read(s, dir).count() === 1)
    // and a passing update still works
    VersionedLake.updateWhere(s, dir, col("id") === 2L, Map("price" -> lit(99.0)))
    assert(VersionedLake.read(s, dir).head().getDouble(1) === 99.0)
  }

  test("multiple constraints validate in ONE pass and report every violated one") {
    val s = spark
    import s.implicits._
    val dir = tmp("lc_multi")
    VersionedLake.appendCommit(Seq((1L, 10.0, "a")).toDF("id", "price", "tag"), dir)
    LakeConstraints.add(s, dir, "price_pos", "price > 0")
    LakeConstraints.add(s, dir, "tag_known", "tag IN ('a', 'b')")
    val e = intercept[IllegalArgumentException](
      VersionedLake.appendCommit(Seq((2L, -1.0, "z")).toDF("id", "price", "tag"), dir))
    assert(e.getMessage.contains("price_pos") && e.getMessage.contains("tag_known"))
    LakeConstraints.drop(s, dir, "tag_known")
    intercept[IllegalArgumentException](
      VersionedLake.appendCommit(Seq((2L, -1.0, "z")).toDF("id", "price", "tag"), dir))
    VersionedLake.appendCommit(Seq((2L, 1.0, "z")).toDF("id", "price", "tag"), dir)
    assert(VersionedLake.read(s, dir).count() === 2)
  }

  test("drop verifies the declared kind: 'unique.x' cannot revoke a CHECK named x") {
    val s = spark
    import s.implicits._
    val dir = tmp("lc_kind")
    VersionedLake.appendCommit(Seq((1L, 10.0)).toDF("id", "price"), dir)
    LakeConstraints.add(s, dir, "x", "price > 0")
    val e = intercept[IllegalArgumentException](
      LakeConstraints.drop(s, dir, "x", kind = Some("unique")))
    assert(e.getMessage.contains("CHECK"))
    assert(LakeConstraints.constraintsOf(s, dir).nonEmpty, "mismatched drop must not remove")
    LakeConstraints.drop(s, dir, "x", kind = Some("check"))
    assert(LakeConstraints.constraintsOf(s, dir).isEmpty)
    // kind-less drop (library face) stays kind-agnostic
    LakeConstraints.addUnique(s, dir, "x", Seq("id"))
    LakeConstraints.drop(s, dir, "x")
    assert(LakeConstraints.uniquesOf(s, dir).isEmpty)
  }

  test("cloneTable rewrites a self-referencing FK onto the clone, not the source") {
    val s = spark
    import s.implicits._
    val src = tmp("lc_fk_src")
    val dst = tmp("lc_fk_dst") + "/clone"
    VersionedLake.appendCommit(
      Seq((1L, Option.empty[Long]), (2L, Some(1L))).toDF("id", "mgr"), src,
      statsCols = Seq("id"))
    LakeConstraints.addFk(s, src, "mgr_fk", Seq("mgr"), src, Seq("id"))
    VersionedLake.cloneTable(s, src, dst)
    val (_, (_, parent, _)) = LakeConstraints.fksOf(s, dst).head
    assert(parent === dst, s"self-FK must follow the clone, got $parent")
    // the clone enforces against ITS OWN rows: referencing the clone's
    // id=2 passes even though nothing new landed in the source
    VersionedLake.appendCommit(Seq((3L, Some(2L))).toDF("id", "mgr"), dst)
    intercept[IllegalArgumentException](
      VersionedLake.appendCommit(Seq((4L, Some(99L))).toDF("id", "mgr"), dst))
    assert(VersionedLake.read(s, dst).count() === 3)
  }

  test("racing DDL: concurrent addUnique and addFk both survive the CAS fence") {
    val s = spark
    import s.implicits._
    val dir = tmp("lc_race")
    val parent = tmp("lc_race_par")
    VersionedLake.appendCommit(Seq((1L, 10L)).toDF("id", "pid"), dir)
    VersionedLake.appendCommit(Seq(Tuple1(10L)).toDF("pid"), parent)
    // the pre-fence layout lost one of these two (atomic replace, last
    // writer wins); the generation store serializes them
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val gate = new java.util.concurrent.CyclicBarrier(2)
    val a = Future { gate.await(); LakeConstraints.addUnique(s, dir, "pk", Seq("id")) }
    val b = Future {
      gate.await(); LakeConstraints.addFk(s, dir, "par", Seq("pid"), parent, Seq("pid"))
    }
    Await.result(a, 120.seconds); Await.result(b, 120.seconds)
    assert(LakeConstraints.uniquesOf(s, dir).map(_._1) === Seq("pk"))
    assert(LakeConstraints.fksOf(s, dir).map(_._1) === Seq("par"))
    // both gates live: duplicate and orphan each refuse
    intercept[IllegalArgumentException](
      VersionedLake.appendCommit(Seq((1L, 10L)).toDF("id", "pid"), dir))
    intercept[IllegalArgumentException](
      VersionedLake.appendCommit(Seq((2L, 99L)).toDF("id", "pid"), dir))
    VersionedLake.appendCommit(Seq((2L, 10L)).toDF("id", "pid"), dir)
    assert(VersionedLake.read(s, dir).count() === 2)
  }

  test("legacy constraints.txt reads, and the first fenced DDL migrates it") {
    val s = spark
    import s.implicits._
    val dir = tmp("lc_legacy")
    VersionedLake.appendCommit(Seq((1L, 10.0)).toDF("id", "price"), dir)
    // write the pre-fence layout by hand
    val p = new org.apache.hadoop.fs.Path(dir, "constraints.txt")
    val fsys = p.getFileSystem(s.sessionState.newHadoopConf())
    val out = fsys.create(p, true)
    try out.write("""{"name":"price_pos","check":"price > 0"}""".getBytes("UTF-8"))
    finally out.close()
    assert(LakeConstraints.constraintsOf(s, dir) === Seq("price_pos" -> "price > 0"))
    intercept[IllegalArgumentException](
      VersionedLake.appendCommit(Seq((2L, -1.0)).toDF("id", "price"), dir))
    // a fenced DDL carries the legacy declaration into the store and
    // retires the file; dropping to an EMPTY set must also stick (a
    // zero-length generation payload would resurrect the constraint)
    LakeConstraints.addUnique(s, dir, "pk", Seq("id"))
    assert(!fsys.exists(p), "legacy file must retire after migration")
    assert(LakeConstraints.constraintsOf(s, dir) === Seq("price_pos" -> "price > 0"))
    LakeConstraints.drop(s, dir, "price_pos")
    LakeConstraints.drop(s, dir, "pk")
    assert(LakeConstraints.constraintsOf(s, dir).isEmpty)
    assert(LakeConstraints.uniquesOf(s, dir).isEmpty)
    VersionedLake.appendCommit(Seq((2L, -1.0)).toDF("id", "price"), dir)
    assert(VersionedLake.read(s, dir).count() === 2)
  }

  test("the streaming sink and catalog INSERT ride the gated paths") {
    val s = spark
    import s.implicits._
    val dir = tmp("lc_sink")
    VersionedLake.appendCommit(Seq((1L, 5.0)).toDF("id", "price"), dir)
    LakeConstraints.add(s, dir, "price_pos", "price > 0")
    val sink = new LakeStreamSink(dir, "lc-app", Nil, Nil, complete = false)
    intercept[IllegalArgumentException](
      sink.addBatch(0L, Seq((2L, -3.0)).toDF("id", "price")))
    sink.addBatch(0L, Seq((2L, 3.0)).toDF("id", "price"))
    assert(VersionedLake.read(s, dir).count() === 2)
  }
}
