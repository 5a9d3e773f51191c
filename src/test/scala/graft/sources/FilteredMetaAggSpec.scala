package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** FILTERED metadata-only aggregates over directory-uniform columns: a
  * pushed conjunct whose column is provably uniform per directory (all
  * rows one non-null value with a zero null count, or all null — the
  * `#stats` min==max + `#ndv` proof; the daily-ingest commit shape) is
  * decided exactly by directory selection and CLAIMED as handled, so
  * `SELECT count(*) WHERE dt = '…'` answers from the satisfying
  * directories' `#rows` lines — zero file opens on a 100 TB table —
  * and a claimed filter nobody satisfies plans a zero-row scan instead
  * of leaking a planning root's rows. Everything undecidable stays a
  * post-scan filter, exactly as before.
  */
class FilteredMetaAggSpec extends SparkSpec {

  private lazy val root: String = {
    val s = spark
    import s.implicits._
    val r = java.nio.file.Files.createTempDirectory("graft_fma").toString
    spark.conf.set("spark.sql.catalog.gfma", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gfma.root", r)
    // three daily commits: dt is UNIFORM per directory, v is not
    val dir = s"$r/days"
    Seq("2026-01-01" -> 40, "2026-01-02" -> 25, "2026-01-03" -> 35).foreach {
      case (day, n) =>
        VersionedLake.appendCommit(
          (1 to n).map(i => (day, i.toLong)).toDF("d", "v")
            .select(to_date(col("d")).as("dt"), col("v")),
          dir, statsCols = Seq("dt", "v"))
    }
    r
  }

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("count(*) under a uniform-column equality answers from the manifest") {
    root
    val df = spark.sql(
      "SELECT count(*) AS n FROM gfma.days WHERE dt = DATE '2026-01-02'")
    assert(df.collect().head.getLong(0) === 25L)
    assert(plan(df).contains("LocalTableScan"),
      s"filtered count over a uniform column must stay metadata-only:\n${plan(df)}")
    // range and IN shapes too
    val rng = spark.sql(
      "SELECT count(*) AS n FROM gfma.days WHERE dt >= DATE '2026-01-02'")
    assert(rng.collect().head.getLong(0) === 60L)
    assert(plan(rng).contains("LocalTableScan"))
    val in = spark.sql("SELECT count(*) AS n FROM gfma.days " +
      "WHERE dt IN (DATE '2026-01-01', DATE '2026-01-03')")
    assert(in.collect().head.getLong(0) === 75L)
    assert(plan(in).contains("LocalTableScan"))
  }

  test("min/max under the claimed filter scope to the surviving directories") {
    root
    val df = spark.sql("SELECT min(v) AS lo, max(v) AS hi FROM gfma.days " +
      "WHERE dt = DATE '2026-01-02'")
    val r = df.collect().head
    assert((r.getLong(0), r.getLong(1)) === ((1L, 25L)))
    assert(plan(df).contains("LocalTableScan"))
  }

  test("a claimed filter nobody satisfies plans a zero-row scan, never a leaking root") {
    root
    val none = spark.sql("SELECT * FROM gfma.days WHERE dt = DATE '2030-01-01'")
    assert(none.count() === 0L, "no directory satisfies: zero rows")
    val cnt = spark.sql(
      "SELECT count(*) AS n FROM gfma.days WHERE dt = DATE '2030-01-01'")
    assert(cnt.collect().head.getLong(0) === 0L)
  }

  test("plain reads under a claimed filter return exactly the satisfying rows") {
    root
    val rows = spark.sql(
      "SELECT v FROM gfma.days WHERE dt = DATE '2026-01-03' ORDER BY v")
      .collect().map(_.getLong(0)).toSeq
    assert(rows === (1L to 35L), "claimed-exact selection must do the filtering")
    // LIMIT under the claimed filter is sound (any-n-rows of satisfying dirs)
    assert(spark.sql(
      "SELECT * FROM gfma.days WHERE dt = DATE '2026-01-01' LIMIT 7").count() === 7L)
  }

  test("a non-uniform column filter stays post-scan and never claims") {
    root
    val df = spark.sql("SELECT count(*) AS n FROM gfma.days WHERE v <= 10")
    assert(df.collect().head.getLong(0) === 30L)
    assert(!plan(df).contains("LocalTableScan"),
      "v spans a range per dir - the filter must stay post-scan")
    // mixed conjuncts: the uniform one claims, the other stays post-scan,
    // the aggregate correctly does NOT take the metadata path
    val mixed = spark.sql("SELECT count(*) AS n FROM gfma.days " +
      "WHERE dt = DATE '2026-01-01' AND v <= 10")
    assert(mixed.collect().head.getLong(0) === 10L)
    assert(!plan(mixed).contains("LocalTableScan"))
  }

  test("GROUP BY a uniform column answers entirely from the manifest") {
    root
    val df = spark.sql(
      "SELECT dt, CAST(count(*) AS BIGINT) AS n FROM gfma.days GROUP BY dt ORDER BY dt")
    assert(df.collect().map(r => (r.getDate(0).toString, r.getLong(1))).toSeq ===
      Seq(("2026-01-01", 40L), ("2026-01-02", 25L), ("2026-01-03", 35L)))
    assert(plan(df).contains("LocalTableScan"),
      s"a uniform-column GROUP BY must stay metadata-only:\n${plan(df)}")
    // grouped extrema scope per group's directories
    val mm = spark.sql(
      "SELECT dt, min(v) AS lo, max(v) AS hi FROM gfma.days GROUP BY dt ORDER BY dt")
    assert(mm.collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
      .toSeq === Seq(("2026-01-01", 1L, 40L), ("2026-01-02", 1L, 25L),
        ("2026-01-03", 1L, 35L)))
    assert(plan(mm).contains("LocalTableScan"))
    // a claimed filter composes: the group set shrinks to satisfying dirs
    val filtered = spark.sql(
      "SELECT dt, CAST(count(*) AS BIGINT) AS n FROM gfma.days " +
        "WHERE dt >= DATE '2026-01-02' GROUP BY dt ORDER BY dt")
    assert(filtered.collect().map(r => (r.getDate(0).toString, r.getLong(1))).toSeq
      === Seq(("2026-01-02", 25L), ("2026-01-03", 35L)))
    assert(plan(filtered).contains("LocalTableScan"))
    // a NON-uniform grouping column falls back to the real scan
    val nu = spark.sql("SELECT v, count(*) AS n FROM gfma.days GROUP BY v")
    assert(nu.collect().length === 40)
    assert(!plan(nu).contains("LocalTableScan"))
    // grouped + filtered EXACT SUM from the "s" layer: daily revenue
    // with zero file opens
    val sm = spark.sql(
      "SELECT dt, sum(v) AS sv FROM gfma.days " +
        "WHERE dt >= DATE '2026-01-02' GROUP BY dt ORDER BY dt")
    assert(sm.collect().map(r => (r.getDate(0).toString, r.getLong(1))).toSeq ===
      Seq(("2026-01-02", (1L to 25L).sum), ("2026-01-03", (1L to 35L).sum)))
    assert(plan(sm).contains("LocalTableScan"),
      s"grouped+filtered sum must stay metadata-only:\n${plan(sm)}")
  }

  test("-0.0 and 0.0 unify: a -0.0-uniform double directory satisfies a 0.0 claim") {
    val s = spark
    import s.implicits._
    root
    val dir0 = {
      val r = java.nio.file.Files.createTempDirectory("graft_fma0").toString
      spark.conf.set("spark.sql.catalog.gfz", classOf[GraftCatalog].getName)
      spark.conf.set("spark.sql.catalog.gfz.root", r)
      s"$r/zeros"
    }
    // Spark's comparisons treat -0.0 = 0.0; a boxed compareTo does not.
    // A directory uniformly -0.0 (stored render "-0.0") must satisfy a
    // pushed `x = 0.0` — the claimed conjunct is dropped from the
    // post-scan filter, so a mismatch would silently return ZERO rows.
    VersionedLake.appendCommit(
      Seq.fill(8)(-0.0d).zipWithIndex.map { case (x, i) => (x, i.toLong) }
        .toDF("x", "v"), dir0, statsCols = Seq("x"))
    VersionedLake.appendCommit(
      Seq.fill(5)(1.5d).zipWithIndex.map { case (x, i) => (x, i.toLong) }
        .toDF("x", "v"), dir0, statsCols = Seq("x"))
    val n = spark.sql("SELECT count(*) AS n FROM gfz.zeros WHERE x = 0.0d")
    assert(n.collect().head.getLong(0) === 8L,
      "the -0.0-uniform directory must satisfy the 0.0 equality claim")
    assert(plan(n).contains("LocalTableScan"), s"claim must stay metadata-only:\n${plan(n)}")
    // and the plain read agrees with Spark's own comparison semantics
    assert(spark.sql("SELECT count(*) AS n FROM gfz.zeros WHERE x = -0.0d")
      .collect().head.getLong(0) === 8L)
  }

  test("TIMESTAMP uniform claims decide through the epoch-micros domain across session TZs") {
    val s = spark
    import s.implicits._
    root
    val r2 = java.nio.file.Files.createTempDirectory("graft_fmt").toString
    spark.conf.set("spark.sql.catalog.gft", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gft.root", r2)
    val dir = s"$r2/ts_ingest"
    val base = 1700000000000000L // epoch micros, well inside the exact-double domain
    val tzBefore = spark.conf.get("spark.sql.session.timeZone")
    try {
      // COMMIT under one session TZ: the #stats strings render in it,
      // which is exactly why the string domain can never prove the claim
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      Seq(0, 1, 2).foreach { k =>
        VersionedLake.appendCommit(
          (1 to 20 + k).map(i => (k * 1000L + i, "x")).toDF("id", "pad")
            .withColumn("ingest_ts", timestamp_micros(lit(base + k * 3600000000L))),
          dir, statsCols = Seq("ingest_ts", "id"))
      }
      // READ under a DIFFERENT session TZ: the claim must come from the
      // canonical epoch-micros histogram edges, not the stored renders
      spark.conf.set("spark.sql.session.timeZone", "UTC")
      val n = spark.sql(
        s"SELECT count(*) AS n FROM gft.ts_ingest " +
          s"WHERE ingest_ts = timestamp_micros(${base + 3600000000L})")
      assert(n.collect().head.getLong(0) === 21L)
      assert(plan(n).contains("LocalTableScan"),
        s"timestamp-uniform filtered count must stay metadata-only:\n${plan(n)}")
      // range shapes ride the same domain
      val ge = spark.sql(
        s"SELECT count(*) AS n FROM gft.ts_ingest " +
          s"WHERE ingest_ts >= timestamp_micros(${base + 3600000000L})")
      assert(ge.collect().head.getLong(0) === 43L)
      assert(plan(ge).contains("LocalTableScan"))
      // grouped: GROUP BY the uniform timestamp answers per commit
      val g = spark.sql(
        "SELECT ingest_ts, CAST(count(*) AS BIGINT) AS n FROM gft.ts_ingest GROUP BY 1")
      val rows = g.collect().map(r => (r.getTimestamp(0).getTime, r.getLong(1))).toSet
      assert(rows === Set(0, 1, 2).map(k =>
        ((base + k * 3600000000L) / 1000L, 20L + k)))
      assert(plan(g).contains("LocalTableScan"),
        s"timestamp-uniform GROUP BY must stay metadata-only:\n${plan(g)}")
    } finally spark.conf.set("spark.sql.session.timeZone", tzBefore)
  }

  test("SELECT DISTINCT over a uniform column answers from the manifest; hybrid unions the residual") {
    val s = spark
    import s.implicits._
    root
    // pure: the three daily-uniform dirs' proven values ARE the set
    val d = spark.sql("SELECT DISTINCT dt FROM gfma.days")
    assert(d.collect().map(_.getDate(0).toString).sorted.toSeq ===
      Seq("2026-01-01", "2026-01-02", "2026-01-03"))
    assert(plan(d).contains("LocalTableScan") && !plan(d).contains("Parquet"),
      s"DISTINCT over a uniform column must stay metadata-only:\n${plan(d)}")
    // under a claimed filter the set scopes to satisfying dirs
    val df = spark.sql(
      "SELECT DISTINCT dt FROM gfma.days WHERE dt >= DATE '2026-01-02'")
    assert(df.collect().map(_.getDate(0).toString).sorted.toSeq ===
      Seq("2026-01-02", "2026-01-03"))
    assert(plan(df).contains("LocalTableScan"))
    // hybrid: a mixed dir contributes its real distinct values via the
    // residual job, unioned with the proven values
    val r2 = java.nio.file.Files.createTempDirectory("graft_fmd").toString
    spark.conf.set("spark.sql.catalog.gfd", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gfd.root", r2)
    val dir = s"$r2/days"
    Seq("2026-01-01" -> 30, "2026-01-02" -> 20).foreach { case (day, n) =>
      VersionedLake.appendCommit(
        (1 to n).map(i => (day, i.toLong)).toDF("d", "v")
          .select(to_date(col("d")).as("dt"), col("v")),
        dir, statsCols = Seq("dt", "v"))
    }
    VersionedLake.appendCommit(
      ((1 to 5).map(i => ("2026-01-02", 50L + i)) ++
        (1 to 5).map(i => ("2026-01-03", 60L + i))).toDF("d", "v")
        .select(to_date(col("d")).as("dt"), col("v")),
      dir, statsCols = Seq("dt", "v"))
    val h = spark.sql(
      "SELECT DISTINCT dt FROM gfd.days WHERE dt >= DATE '2026-01-02'")
    assert(h.collect().map(_.getDate(0).toString).sorted.toSeq ===
      Seq("2026-01-02", "2026-01-03"),
      "proven value + the residual dir's two filtered values, deduped")
    assert(plan(h).contains("GraftLakeHybridMetaAgg"), s"hybrid must carry:\n${plan(h)}")
  }

  test("HYBRID: one compacted multi-day directory no longer kills the filtered fast path") {
    val s = spark
    import s.implicits._
    root
    val r2 = java.nio.file.Files.createTempDirectory("graft_fmh").toString
    spark.conf.set("spark.sql.catalog.gfh", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gfh.root", r2)
    val dir = s"$r2/days"
    // three daily-uniform commits …
    Seq("2026-01-01" -> 40, "2026-01-02" -> 25, "2026-01-03" -> 35).foreach {
      case (day, n) =>
        VersionedLake.appendCommit(
          (1 to n).map(i => (day, i.toLong)).toDF("d", "v")
            .select(to_date(col("d")).as("dt"), col("v")),
          dir, statsCols = Seq("dt", "v"))
    }
    // … plus ONE compacted directory that merged two days (what
    // optimize() on an undeclared-spec table produces): dt is NOT
    // uniform there, which used to stand the whole claim down
    VersionedLake.appendCommit(
      ((1 to 10).map(i => ("2026-01-03", 100L + i)) ++
        (1 to 20).map(i => ("2026-01-04", 200L + i))).toDF("d", "v")
        .select(to_date(col("d")).as("dt"), col("v")),
      dir, statsCols = Seq("dt", "v"))
    val B = org.apache.spark.sql.graft.LakePruningScanBuilder

    // filtered count: proven dirs from the manifest + a real job over
    // ONLY the residual dir
    B.lastHybridResidual.remove()
    val n2 = spark.sql(
      "SELECT count(*) AS n FROM gfh.days WHERE dt = DATE '2026-01-02'")
    assert(n2.collect().head.getLong(0) === 25L)
    val residual = B.lastHybridResidual.get()
    assert(residual != null && residual.size === 1,
      s"exactly the compacted dir must be the residual, got $residual")
    assert(plan(n2).contains("GraftLakeHybridMetaAgg"),
      s"the hybrid scan must carry the plan:\n${plan(n2)}")
    assert(!plan(n2).toLowerCase.contains("parquet"),
      s"EXPLAIN/plan must not show a table scan:\n${plan(n2)}")

    // a day that SPANS both sides combines manifest + residual rows
    val n3 = spark.sql(
      "SELECT count(*) AS n FROM gfh.days WHERE dt = DATE '2026-01-03'")
    assert(n3.collect().head.getLong(0) === 45L, "35 proven + 10 residual")

    // grouped under the claim: proven groups from the manifest, residual
    // groups from the job, merged per key
    val g = spark.sql(
      "SELECT dt, CAST(count(*) AS BIGINT) AS n, max(v) AS hi " +
        "FROM gfh.days WHERE dt >= DATE '2026-01-02' GROUP BY dt")
    val rows = g.collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSet
    assert(rows === Set(("2026-01-02", 25L, 25L), ("2026-01-03", 45L, 110L),
      ("2026-01-04", 20L, 220L)))

    // plain (non-aggregate) reads under a hybrid claim return exactly
    // the satisfying rows — the read-through applies the claimed
    // conjunct per row on the residual dir
    val sel = spark.sql(
      "SELECT v FROM gfh.days WHERE dt = DATE '2026-01-03' ORDER BY v")
    val vs = sel.collect().map(_.getLong(0)).toSeq
    assert(vs === ((1L to 35L) ++ (101L to 110L)),
      s"read-through must keep only day-3 rows, got ${vs.take(50)}")

    // sums combine exactly across the two sides
    val t = spark.sql(
      "SELECT sum(v) AS tot FROM gfh.days WHERE dt = DATE '2026-01-03'")
    assert(t.collect().head.getLong(0) === (1L to 35L).sum + (101L to 110L).sum)

    // avg rides the hybrid through its sum+count decomposition (the
    // outputs alone don't merge); count(col) merges directly
    val av = spark.sql(
      "SELECT avg(v) AS m, count(v) AS n FROM gfh.days WHERE dt = DATE '2026-01-03'")
    val avr = av.collect().head
    val vals = (1L to 35L) ++ (101L to 110L)
    assert(avr.getLong(1) === vals.size.toLong)
    assert(avr.getDouble(0) === vals.sum.toDouble / vals.size)
    assert(plan(av).contains("GraftLakeHybridMetaAgg"),
      s"avg must decompose through the hybrid:\n${plan(av)}")
  }

  test("LIKE shapes (prefix/suffix/contains) claim on uniform string columns") {
    val s = spark
    import s.implicits._
    root
    val r2 = java.nio.file.Files.createTempDirectory("graft_fml").toString
    spark.conf.set("spark.sql.catalog.gfl", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gfl.root", r2)
    val dir = s"$r2/src"
    // per-directory uniform `source` paths — the ingest-source column
    Seq("s3://raw/web/2026" -> 12, "s3://raw/books/2026" -> 9,
      "s3://curated/web/2025" -> 7).foreach { case (src, n) =>
      VersionedLake.appendCommit(
        (1 to n).map(i => (src, i.toLong)).toDF("source", "v"),
        dir, statsCols = Seq("source"))
    }
    val pre = spark.sql(
      "SELECT count(*) AS n FROM gfl.src WHERE source LIKE 's3://raw/%'")
    assert(pre.collect().head.getLong(0) === 21L)
    assert(plan(pre).contains("LocalTableScan"),
      s"a prefix LIKE over a uniform column must stay metadata-only:\n${plan(pre)}")
    val mid = spark.sql(
      "SELECT count(*) AS n FROM gfl.src WHERE source LIKE '%/web/%'")
    assert(mid.collect().head.getLong(0) === 19L)
    assert(plan(mid).contains("LocalTableScan"))
    val suf = spark.sql(
      "SELECT count(*) AS n FROM gfl.src WHERE source LIKE '%2026'")
    assert(suf.collect().head.getLong(0) === 21L)
    assert(plan(suf).contains("LocalTableScan"))
    // and plain reads under the claim return exactly the matching rows
    assert(spark.sql(
      "SELECT count(v) AS n FROM gfl.src WHERE source LIKE 's3://curated%'")
      .head().getLong(0) === 7L)
  }

  test("negated shapes (!=, NOT IN, NOT LIKE) claim with SQL null semantics") {
    val s = spark
    import s.implicits._
    root
    // the gfma.days fixture: three uniform day dirs (40/25/35 rows)
    val ne = spark.sql(
      "SELECT count(*) AS n FROM gfma.days WHERE dt != DATE '2026-01-02'")
    assert(ne.collect().head.getLong(0) === 75L)
    assert(plan(ne).contains("LocalTableScan"),
      s"!= over a uniform column must stay metadata-only:\n${plan(ne)}")
    val nin = spark.sql(
      "SELECT count(*) AS n FROM gfma.days " +
        "WHERE dt NOT IN (DATE '2026-01-01', DATE '2026-01-03')")
    assert(nin.collect().head.getLong(0) === 25L)
    assert(plan(nin).contains("LocalTableScan"))
    // NOT LIKE on a uniform string column
    val r2 = java.nio.file.Files.createTempDirectory("graft_fmn").toString
    spark.conf.set("spark.sql.catalog.gfn", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gfn.root", r2)
    val dir = s"$r2/src"
    Seq("raw/web" -> 12, "raw/books" -> 9, "curated/web" -> 7).foreach {
      case (src, n) =>
        VersionedLake.appendCommit(
          (1 to n).map(i => (src, i.toLong)).toDF("source", "v"),
          dir, statsCols = Seq("source"))
    }
    val nl = spark.sql(
      "SELECT count(*) AS n FROM gfn.src WHERE source NOT LIKE 'raw/%'")
    assert(nl.collect().head.getLong(0) === 7L)
    assert(plan(nl).contains("LocalTableScan"))
    // null semantics: a dir holding ONLY nulls never satisfies a negated
    // value predicate (NOT(null) = null drops the row)
    VersionedLake.appendCommit(
      (1 to 5).map(i => (Option.empty[String], 100L + i)).toDF("source", "v"),
      dir, statsCols = Seq("source"))
    val nl2 = spark.sql(
      "SELECT count(*) AS n FROM gfn.src WHERE source NOT LIKE 'raw/%'")
    assert(nl2.collect().head.getLong(0) === 7L,
      "the all-null dir contributes nothing to a negated predicate")
    assert(plan(nl2).contains("LocalTableScan"))
  }

  test("a directory mixing nulls and values blocks the claim (no uniform proof)") {
    val s = spark
    import s.implicits._
    val r2 = java.nio.file.Files.createTempDirectory("graft_fma2").toString
    spark.conf.set("spark.sql.catalog.gfma2", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gfma2.root", r2)
    val dir = s"$r2/t"
    VersionedLake.appendCommit(
      (1 to 20).map(i =>
        (if (i % 2 == 0) "2026-01-01" else null, i.toLong)).toDF("d", "v")
        .select(to_date(col("d")).as("dt"), col("v")),
      dir, statsCols = Seq("dt"))
    val df = spark.sql(
      "SELECT count(*) AS n FROM gfma2.t WHERE dt = DATE '2026-01-01'")
    assert(df.collect().head.getLong(0) === 10L,
      "a mixed null/value dir must answer through a real filtered scan")
    assert(!plan(df).contains("LocalTableScan"))
    // an ALL-NULL directory decides IS NULL / IS NOT NULL exactly
    val dir2 = s"$r2/t2"
    VersionedLake.appendCommit(
      (1 to 8).map(i => (null.asInstanceOf[String], i.toLong)).toDF("d", "v")
        .select(to_date(col("d")).as("dt"), col("v")),
      dir2, statsCols = Seq("dt"))
    VersionedLake.appendCommit(
      (1 to 5).map(i => ("2026-01-01", i.toLong)).toDF("d", "v")
        .select(to_date(col("d")).as("dt"), col("v")),
      dir2, statsCols = Seq("dt"))
    val nn = spark.sql("SELECT count(*) AS n FROM gfma2.t2 WHERE dt IS NOT NULL")
    assert(nn.collect().head.getLong(0) === 5L)
    assert(plan(nn).contains("LocalTableScan"),
      s"all-null vs all-value dirs decide nullness exactly:\n${plan(nn)}")
    val isn = spark.sql("SELECT count(*) AS n FROM gfma2.t2 WHERE dt IS NULL")
    assert(isn.collect().head.getLong(0) === 8L)
    assert(plan(isn).contains("LocalTableScan"))
  }
}
