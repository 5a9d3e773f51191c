package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Metadata-only aggregates and manifest-exact scan statistics through
  * the SQL catalog: an unfiltered count(*)/min/max plans as a
  * LocalTableScan (zero file opens), anything the manifest cannot
  * answer exactly falls back to a real scan, and join planning sees the
  * manifest's exact row/byte totals (auto-broadcast without a hint).
  */
class LakeMetaAggSpec extends SparkSpec {

  private lazy val root: String = {
    val r = java.nio.file.Files.createTempDirectory("graft_metaagg").toString
    spark.conf.set("spark.sql.catalog.gma", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gma.root", r)
    r
  }

  private def mkTable(name: String, statsCols: Seq[String] = Seq("k")): String = {
    val s = spark
    import s.implicits._
    val dir = s"$root/$name"
    VersionedLake.appendCommit(
      (1L to 100L).map(i => (i, s"v$i", i * 1.5)).toDF("k", "s", "x"),
      dir, statsCols = statsCols)
    VersionedLake.appendCommit(
      (101L to 130L).map(i => (i, s"v$i", i * 1.5)).toDF("k", "s", "x"),
      dir, statsCols = statsCols)
    dir
  }

  private def planOf(sql: String): String = {
    val df = spark.sql(sql)
    df.queryExecution.executedPlan.toString
  }

  test("unfiltered count(*) answers from the manifest: LocalTableScan, no file read") {
    mkTable("cnt")
    val df = spark.sql("SELECT count(*) AS n FROM gma.cnt")
    assert(df.collect().head.getLong(0) === 130L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan"), s"expected metadata-only scan, got:\n$plan")
    assert(!plan.contains("Parquet"), s"no parquet scan may appear:\n$plan")
  }

  test("unfiltered min/max on a stats-declared column answers from the manifest") {
    mkTable("mm")
    val df = spark.sql("SELECT min(k) AS lo, max(k) AS hi FROM gma.mm")
    val r = df.collect().head
    assert((r.getLong(0), r.getLong(1)) === ((1L, 130L)))
    assert(df.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    // count and extrema together still answer from metadata
    val both = spark.sql("SELECT count(*) AS n, max(k) AS hi FROM gma.mm")
    assert(both.collect().head.getLong(0) === 130L)
    assert(both.queryExecution.executedPlan.toString.contains("LocalTableScan"))
  }

  test("unfiltered SUM over an integral stats column answers from the manifest") {
    mkTable("sm")
    val df = spark.sql("SELECT sum(k) AS s, count(*) AS n FROM gma.sm")
    val r = df.collect().head
    assert(r.getLong(0) === (1L to 130L).sum)
    assert(r.getLong(1) === 130L)
    assert(df.queryExecution.executedPlan.toString.contains("LocalTableScan"),
      "sum over the #ndv layer's exact per-dir sums must stay metadata-only")
    // a DOUBLE column never stores a sum (order-dependent): real scan
    val dbl = spark.sql("SELECT sum(x) AS s FROM gma.sm")
    assert(math.abs(dbl.collect().head.getDouble(0) - (1 to 130).map(_ * 1.5).sum) < 1e-6)
    assert(!dbl.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    // DISTINCT sums decline
    val ds = spark.sql("SELECT sum(DISTINCT k) AS s FROM gma.sm")
    assert(ds.collect().head.getLong(0) === (1L to 130L).sum)
    assert(!ds.queryExecution.executedPlan.toString.contains("LocalTableScan"))
  }

  test("count(col) answers from the #ndv exact null counts; avg derives as sum/count") {
    val s = spark
    import s.implicits._
    val dir = s"$root/cntcol"
    // every third k is null in dir 1, none in dir 2 — the exact per-dir
    // null counts make count(k) = Σ(rows − nulls) manifest-exact
    VersionedLake.appendCommit(
      (1L to 90L).map(i => (if (i % 3 == 0) None else Some(i), s"v$i"))
        .toDF("k", "s"), dir, statsCols = Seq("k"))
    VersionedLake.appendCommit(
      (91L to 130L).map(i => (Some(i), s"v$i")).toDF("k", "s"),
      dir, statsCols = Seq("k"))
    val df = spark.sql("SELECT count(k) AS nk, avg(k) AS mean FROM gma.cntcol")
    val r = df.collect().head
    val vals = ((1L to 90L).filter(_ % 3 != 0) ++ (91L to 130L))
    assert(r.getLong(0) === vals.size.toLong)
    assert(r.getDouble(1) === vals.sum.toDouble / vals.size)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan") && !plan.contains("Parquet"),
      s"count(col)/avg over declared stats must stay metadata-only:\n$plan")
  }

  test("count(col)/avg negatives: undeclared column and fractional avg fall back to a real scan") {
    mkTable("cntneg") // stats on k only; x is double
    // count of an UNDECLARED column: no null counts → real scan
    val p1 = planOf("SELECT count(s) AS n FROM gma.cntneg")
    assert(!p1.contains("LocalTableScan"), s"undeclared column must scan:\n$p1")
    // avg over a fractional column: Spark's double accumulation is not
    // reproducible from an exact sum → real scan even if declared
    val dir = s"$root/avgfrac"
    val s2 = spark
    import s2.implicits._
    VersionedLake.appendCommit(
      (1L to 50L).map(i => (i, i * 1.5)).toDF("k", "x"), dir,
      statsCols = Seq("k", "x"))
    val p2 = planOf("SELECT avg(x) AS m FROM gma.avgfrac")
    assert(!p2.contains("LocalTableScan"), s"fractional avg must scan:\n$p2")
    // count(DISTINCT k) has no exact layer → real scan
    val p3 = planOf("SELECT count(DISTINCT k) AS d FROM gma.cntneg")
    assert(!p3.contains("LocalTableScan"), s"distinct count must scan:\n$p3")
  }

  test("a filter forces a real scan (post-scan filters block aggregate pushdown)") {
    mkTable("flt")
    val df = spark.sql("SELECT count(*) AS n FROM gma.flt WHERE k <= 50")
    assert(df.collect().head.getLong(0) === 50L)
    assert(!df.queryExecution.executedPlan.toString.contains("LocalTableScan"),
      "a filtered count must read data, not metadata")
  }

  test("min/max on a column without declared stats falls back to a real scan") {
    mkTable("nostats")
    val df = spark.sql("SELECT min(x) AS lo FROM gma.nostats")
    assert(df.collect().head.getDouble(0) === 1.5)
    assert(!df.queryExecution.executedPlan.toString.contains("LocalTableScan"))
  }

  test("group-by on a NON-uniform column never uses the metadata path") {
    mkTable("grp")
    val df = spark.sql("SELECT s, count(*) AS n FROM gma.grp GROUP BY s")
    assert(df.collect().length === 130)
    assert(!df.queryExecution.executedPlan.toString.contains("LocalTableScan"))
  }

  test("string min/max answers from stats with UTF-8 order") {
    val s = spark
    import s.implicits._
    val dir = s"$root/strmm"
    VersionedLake.appendCommit(
      Seq(("bb", 1L), ("aa", 2L)).toDF("name", "k"), dir, statsCols = Seq("name"))
    VersionedLake.appendCommit(
      Seq(("zz", 3L), ("mm", 4L)).toDF("name", "k"), dir, statsCols = Seq("name"))
    val df = spark.sql("SELECT min(name) AS lo, max(name) AS hi FROM gma.strmm")
    val r = df.collect().head
    assert((r.getString(0), r.getString(1)) === (("aa", "zz")))
    assert(df.queryExecution.executedPlan.toString.contains("LocalTableScan"))
  }

  test("count(*) stays metadata-only over a pending POSITION delete (exact per-dir counts)") {
    val s = spark
    import s.implicits._
    val dir = s"$root/morcnt"
    VersionedLake.appendCommit((1L to 100L).map(i => (i, s"v$i")).toDF("k", "vv"), dir)
    VersionedLake.appendCommit((101L to 160L).map(i => (i, s"v$i")).toDF("k", "vv"), dir)
    // deleteWhereMor's matched scan records EXACT per-dir deleted counts
    // on the eqdelete line: logical rows = Σ #rows − Σ deleted
    VersionedLake.deleteWhereMor(s, dir, col("k") % 10 === 0L)
    val df = spark.sql("SELECT count(*) AS n FROM gma.morcnt")
    assert(df.collect().head.getLong(0) === 144L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan") && !plan.contains("Parquet") &&
      !plan.contains("BroadcastHashJoin"),
      s"pending position deletes must not stand down unfiltered count(*):\n$plan")
    // the metadata answer matches the post-compaction truth exactly
    VersionedLake.materializeDeletes(s, dir)
    assert(spark.sql("SELECT count(*) AS n FROM gma.morcnt").head().getLong(0) === 144L)
    // a SECOND pending delete stacks its counts (positions disjoint by
    // construction: the matched read applies earlier pending deletes)
    VersionedLake.appendCommit((161L to 170L).map(i => (i, s"v$i")).toDF("k", "vv"), dir)
    VersionedLake.deleteWhereMor(s, dir, col("k") > 158L)
    val df2 = spark.sql("SELECT count(*) AS n FROM gma.morcnt")
    // 144 survivors + 10 appended − {159, 161..170} = 143
    assert(df2.collect().head.getLong(0) === 143L)
    assert(df2.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    // anything beyond unfiltered count(*) still reads through exactly
    val mm = spark.sql("SELECT min(k) AS lo FROM gma.morcnt")
    assert(!mm.queryExecution.executedPlan.toString.contains("LocalTableScan"),
      "min/max cannot adjust for deleted rows' unknown values")
    assert(mm.collect().head.getLong(0) === 1L)
    val flt = spark.sql("SELECT count(*) AS n FROM gma.morcnt WHERE k > 50")
    assert(flt.collect().head.getLong(0) ===
      (51L to 158L).count(_ % 10 != 0).toLong)
  }

  test("count(*) stays metadata-only on a RENAMED table (read-through versions don't change row counts)") {
    val s = spark
    import s.implicits._
    val dir = s"$root/rencnt"
    VersionedLake.appendCommit((1L to 80L).map(i => (i, s"v$i")).toDF("old_k", "vv"), dir)
    VersionedLake.renameColumn(s, dir, "old_k", "k")
    // rename indirection forces the read-through splice for data reads,
    // but physical rows ARE logical rows — count(*) answers from #rows
    val df = spark.sql("SELECT count(*) AS n FROM gma.rencnt")
    assert(df.collect().head.getLong(0) === 80L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan") && !plan.contains("Parquet"),
      s"rename indirection must not force a scan for bare count(*):\n$plan")
    // the data read itself still goes through the splice, exactly
    assert(spark.sql("SELECT max(k) AS hi FROM gma.rencnt").head().getLong(0) === 80L)
  }

  test("count over a version with pending MoR deletes bypasses the metadata path") {
    val s = spark
    import s.implicits._
    val dir = s"$root/morref"
    VersionedLake.appendCommit((1L to 10L).toDF("k"), dir)
    VersionedLake.deleteKeysMor(s, dir, Seq(3L).toDF("k"), Seq("k"))
    // manifest #rows lines still say 10 — answering from them would
    // overcount; the MoR read-through scan computes the true 9
    val got = spark.sql("SELECT count(*) AS n FROM gma.morref").head().getLong(0)
    assert(got === 9L,
      "physical counts over pending deletes must come from the anti-joined scan")
  }

  test("join planning sees manifest-exact statistics: small lake table auto-broadcasts") {
    val s = spark
    import s.implicits._
    val small = s"$root/dim_small"
    val big = s"$root/fact_big"
    VersionedLake.appendCommit(
      (1L to 50L).map(i => (i, s"n$i")).toDF("id", "nm"), small)
    VersionedLake.appendCommit(
      (1L to 20000L).map(i => (i % 50 + 1, i * 2.0)).toDF("id", "v"), big)
    val q = spark.sql(
      "SELECT f.id, d.nm, f.v FROM gma.fact_big f JOIN gma.dim_small d ON f.id = d.id")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the 50-row dim must broadcast off manifest stats, plan was:\n$plan")
    assert(q.count() === 20000L)
    // and the logical stats are the manifest's EXACT row counts
    val rel = q.queryExecution.optimizedPlan.collectLeaves()
    val counts = rel.flatMap(_.stats.rowCount).map(_.toLong).sorted
    assert(counts === Seq(50L, 20000L),
      s"exact row counts must surface in plan statistics, got $counts")
  }
}
