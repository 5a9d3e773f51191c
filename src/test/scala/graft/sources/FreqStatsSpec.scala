package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Frequent-values (top-K) sketches for CATEGORICAL selectivity: every
  * stats-layered commit sketches its non-numeric stats columns in the
  * same single aggregation pass as min/max/HLL/histogram, the sketch
  * rides the `#ndv` manifest layer (so every carry path preserves it for
  * free), and the catalog scan refines its REPORTED rows/bytes when a
  * pushed string equality lands on a fully-covered column — the
  * categorical counterpart of the numeric histogram layer. At 100 TB
  * this is what lets `WHERE status = 'FAILED'` on a 95%-'OK' table
  * auto-broadcast (tail share, not rows/NDV) while `WHERE status = 'OK'`
  * correctly shuffles.
  */
class FreqStatsSpec extends SparkSpec {

  // one heavy value (~95%) + ~97 rare values (~5% spread thin)
  private def statusOf(k: org.apache.spark.sql.Column) =
    when(k % 20 === 0, concat(lit("RARE-"), (k % 97).cast("string")))
      .otherwise(lit("COMMON"))

  private lazy val root: String = {
    val r = java.nio.file.Files.createTempDirectory("graft_frq").toString
    spark.conf.set("spark.sql.catalog.gfrq", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gfrq.root", r)
    val fact = spark.range(0, 60000).select(
      col("id").as("k"), statusOf(col("id")).as("status"))
    val f = s"$r/fct"
    VersionedLake.appendCommit(fact.filter(col("k") < 30000), f,
      statsCols = Seq("k", "status"))
    VersionedLake.appendCommit(fact.filter(col("k") >= 30000), f,
      statsCols = Seq("k", "status"))
    r
  }

  test("the sketch rides #ndv: heavy value prices heavy, rare value prices tail-share") {
    val f = s"$root/fct"
    val v = VersionedLake.currentVersion(spark, f).get
    val freq = VersionedLake.dirFreq(spark, f, v)
    assert(freq.size === 2, "both appended directories carry a status sketch")
    freq.values.foreach { cols =>
      assert(cols.contains("status"), "string stats columns sketch")
      assert(cols.contains("k"), "integral stats columns sketch too (point-filter selectivity)")
    }
    val ndv = VersionedLake.dirNdv(spark, f, v)
    val rows = VersionedLake.dirRowCounts(spark, f, v)
    val perDir = freq.map { case (d, cols) =>
      val nonNull = rows(d)._1 - ndv(d)("status")._2
      val dNdv = VersionedLake.ndvEstimate(Seq(ndv(d)("status")._1))
      (graft.functions.FreqSketch.estimate(cols("status"), nonNull, dNdv, "COMMON"),
        graft.functions.FreqSketch.estimate(cols("status"), nonNull, dNdv, "RARE-13"),
        nonNull)
    }.toSeq
    perDir.foreach { case (common, rare, nonNull) =>
      assert(common >= nonNull * 0.90 && common <= nonNull * 1.05,
        s"heavy value must price ~95% of $nonNull rows, got $common")
      // true count per rare value ≈ nonNull*0.05/97 ≈ 15; uniform-over-NDV
      // would say nonNull/98 ≈ 306 — the sketch must land near the tail
      assert(rare <= nonNull * 0.05,
        s"rare value must price within the 5% tail, got $rare of $nonNull")
    }
  }

  test("scan refinement: a rare-value equality reports tail-share rows, the heavy value ~all") {
    root
    def reportedRows(value: String): BigInt = {
      val df = spark.table("gfrq.fct").filter(col("status") === value)
      val rel = df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
      }
      assert(rel.nonEmpty, "catalog read must plan as a DSv2 scan relation")
      rel.head.computeStats().rowCount.getOrElse(fail("no row count reported"))
    }
    val rare = reportedRows("RARE-13")
    val heavy = reportedRows("COMMON")
    assert(rare <= BigInt(3100),
      s"rare equality must report ~tail-share (true ~31, uniform-NDV ~612), got $rare")
    assert(heavy >= BigInt(50000),
      s"heavy equality must report ~95% of 60000, got $heavy")
    // no sketched equality pushed -> the raw manifest sum, untouched
    val unfiltered = spark.table("gfrq.fct").queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.computeStats().rowCount
    }.head
    assert(unfiltered.contains(BigInt(60000)))
    // the diagnostic face: t$stats surfaces the merged heavy hitter
    val top = spark.sql("SELECT column, top_values FROM gfrq.`fct$stats`")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(top("status") != null && top("status").startsWith("COMMON:"),
      s"the skew diagnostic must lead with the heavy value, got '${top("status")}'")
  }

  test("IS NULL / IS NOT NULL refine exactly off the null counts") {
    val s = spark
    import s.implicits._
    val r = java.nio.file.Files.createTempDirectory("graft_frq4").toString
    spark.conf.set("spark.sql.catalog.gfrq4", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gfrq4.root", r)
    val f = s"$r/t"
    // 10% of rows carry the enrichment column
    VersionedLake.appendCommit(
      spark.range(0, 20000).select(col("id").as("k"),
        when(col("id") % 10 === 0, concat(lit("e"), col("id")).cast("string"))
          .otherwise(lit(null).cast("string")).as("enrich")),
      f, statsCols = Seq("k", "enrich"))
    def reported(cond: org.apache.spark.sql.Column): BigInt =
      spark.table("gfrq4.t").filter(cond).queryExecution.optimizedPlan.collect {
        case rr: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          rr.computeStats().rowCount
      }.head.getOrElse(fail("no row count"))
    assert(reported(col("enrich").isNotNull) === BigInt(2000),
      "IS NOT NULL must price at the exact non-null count")
    assert(reported(col("enrich").isNull) === BigInt(18000),
      "IS NULL must price at the exact null count")
  }

  test("carry and re-key: appends keep old sketches verbatim; optimize re-sketches the rewrite") {
    val s = spark
    import s.implicits._
    val r = java.nio.file.Files.createTempDirectory("graft_frq2").toString
    val f = s"$r/t"
    val mk = (lo: Long, hi: Long) => spark.range(lo, hi).select(
      col("id").as("k"), statusOf(col("id")).as("status"))
    VersionedLake.appendCommit(mk(0, 10000), f, statsCols = Seq("k", "status"))
    val v0 = VersionedLake.currentVersion(spark, f).get
    val raw0 = VersionedLake.dirFreq(spark, f, v0)
    VersionedLake.appendCommit(mk(10000, 20000), f, statsCols = Seq("k", "status"))
    val v1 = VersionedLake.currentVersion(spark, f).get
    val raw1 = VersionedLake.dirFreq(spark, f, v1)
    assert(raw1.size === 2, "the append adds its own sketch")
    raw0.foreach { case (d, cols) =>
      assert(raw1(d)("status").toSeq === cols("status").toSeq,
        "the untouched directory's sketch carries byte-verbatim")
    }
    // re-key: optimize rewrites both dirs into one — the new dir must
    // re-sketch (estimates over the union), not lose the layer
    VersionedLake.optimize(spark, f)
    val v2 = VersionedLake.currentVersion(spark, f).get
    val freq2 = VersionedLake.dirFreq(spark, f, v2)
    val ndv2 = VersionedLake.dirNdv(spark, f, v2)
    val rows2 = VersionedLake.dirRowCounts(spark, f, v2)
    assert(freq2.nonEmpty, "optimize must re-sketch the rewritten directory")
    val d = freq2.keys.head
    val nonNull = rows2(d)._1 - ndv2(d)("status")._2
    val est = graft.functions.FreqSketch.estimate(
      freq2(d)("status"), nonNull,
      VersionedLake.ndvEstimate(Seq(ndv2(d)("status")._1)), "COMMON")
    assert(est >= nonNull * 0.90, s"re-keyed sketch prices the heavy value, got $est")
  }

  test("conservatism: one covered-dir gap disables refinement, never distorts it") {
    val s = spark
    import s.implicits._
    val r = java.nio.file.Files.createTempDirectory("graft_frq3").toString
    spark.conf.set("spark.sql.catalog.gfrq3", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gfrq3.root", r)
    val f = s"$r/t"
    VersionedLake.appendCommit(
      spark.range(0, 10000).select(col("id").as("k"), statusOf(col("id")).as("status")),
      f, statsCols = Seq("k", "status"))
    // second dir committed WITHOUT the stats layer: no sketch there
    VersionedLake.appendCommit(
      spark.range(10000, 20000).select(col("id").as("k"), statusOf(col("id")).as("status")),
      f)
    val df = spark.table("gfrq3.t").filter(col("status") === "RARE-13")
    val rel = df.queryExecution.optimizedPlan.collect {
      case rr: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => rr
    }
    val rows = rel.head.computeStats().rowCount
    assert(rows.contains(BigInt(20000)),
      s"a dir without the sketch must block refinement (full rows), got $rows")
  }

  test("integral skew refines like string skew: a rare int code prices at tail share") {
    val s = spark
    import s.implicits._
    val r = java.nio.file.Files.createTempDirectory("graft_frq5").toString
    spark.conf.set("spark.sql.catalog.gfrq5", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gfrq5.root", r)
    val f = s"$r/t"
    // heavy code 7777 (95%), rare codes 0..96 in the tail
    VersionedLake.appendCommit(
      spark.range(0, 40000).select(col("id").as("k"),
        when(col("id") % 20 === 0, col("id") % 97).otherwise(lit(7777L)).as("code")),
      f, statsCols = Seq("code"))
    def reported(cond: org.apache.spark.sql.Column): BigInt =
      spark.table("gfrq5.t").filter(cond).queryExecution.optimizedPlan.collect {
        case rr: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          rr.computeStats().rowCount
      }.head.getOrElse(fail("no row count"))
    val rare = reported(col("code") === 13L)
    val heavy = reported(col("code") === 7777L)
    assert(rare <= BigInt(2000),
      s"rare int code must price within the 5% tail (true ~21), got $rare")
    assert(heavy >= BigInt(35000),
      s"heavy int code must price ~95% of 40000, got $heavy")
  }

  test("CALL system.estimate_rows reports the planner's refined estimate") {
    root // the gfrq catalog with the skewed status fixture
    spark.conf.set("spark.sql.catalog.gfrq.root",
      spark.conf.get("spark.sql.catalog.gfrq.root"))
    def est(pred: String): Long = spark.sql(
      s"CALL gfrq.system.estimate_rows('fct', '$pred')").head().getLong(0)
    assert(est("status = ''RARE-13''") <= 3100L,
      "rare equality estimates at tail share through the SQL face")
    assert(est("status = ''COMMON''") >= 50000L,
      "heavy equality estimates near full")
    assert(est("k >= 0") === 60000L,
      "an all-covering range estimates the full table (CDF mass = 1)")
    // k is uniform 0..59999 in two 30000-row dirs; `k < 6000` prunes the
    // upper dir entirely and the histogram CDF prices ~20% of the lower
    val windowed = est("k < 6000")
    assert(windowed >= 4500L && windowed <= 7500L,
      s"a range predicate must price off the histogram edges (true 6000), got $windowed")
  }
}
