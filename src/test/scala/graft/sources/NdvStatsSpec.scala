package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Column-level CBO statistics off the manifest's `#ndv` layer: every
  * stats-layered commit writes a per-directory HLL sketch + exact null
  * count in the SAME aggregation pass as min/max; the catalog scan
  * merges the kept directories' sketches driver-side and reports
  * `columnStats` through DSv2 — so Catalyst's cost-based estimation
  * sees per-column cardinalities, not just row counts. At 100 TB this
  * is what turns "the filtered fact is actually one row" from a guess
  * into a plan: a point predicate on a near-unique column estimates
  * down to rowCount/NDV and the filtered side broadcasts with no hint.
  */
class NdvStatsSpec extends SparkSpec {

  private lazy val root: String = {
    val r = java.nio.file.Files.createTempDirectory("graft_ndv").toString
    spark.conf.set("spark.sql.catalog.gndv", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gndv.root", r)
    val fact = spark.range(0, 60000).select(
      col("id").as("k"),
      (col("id") % 7).as("grp"),
      when(col("id") % 10 === 0, lit(null)).otherwise(concat(lit("pad-"), col("id")))
        .cast("string").as("tag"))
    val f = s"$r/fct"
    VersionedLake.appendCommit(fact.filter(col("k") < 30000), f,
      statsCols = Seq("k", "grp", "tag"))
    VersionedLake.appendCommit(fact.filter(col("k") >= 30000), f,
      statsCols = Seq("k", "grp", "tag"))
    val dim = spark.range(0, 20000)
      .select(col("id").as("dk"), concat(lit("name-"), col("id")).as("nm"))
    VersionedLake.appendCommit(dim, s"$r/dm")
    r
  }

  test("#ndv round-trips: sketches merge to the true distinct count, nulls exact") {
    val f = s"$root/fct"
    val v = VersionedLake.currentVersion(spark, f).get
    val ndv = VersionedLake.dirNdv(spark, f, v)
    assert(ndv.size === 2, "both appended directories carry an #ndv line")
    ndv.values.foreach(cols => assert(cols.keySet === Set("k", "grp", "tag")))
    def merged(c: String): (Long, Long) = {
      val entries = ndv.values.map(_(c)).toSeq
      (VersionedLake.ndvEstimate(entries.map(_._1)), entries.map(_._2).sum)
    }
    val (kNdv, kNulls) = merged("k")
    assert(kNulls === 0L)
    assert(math.abs(kNdv - 60000L) <= 60000L * 5 / 100,
      s"HLL estimate for a 60k-unique column must land within 5%, got $kNdv")
    val (gNdv, gNulls) = merged("grp")
    assert(gNulls === 0L && gNdv === 7L,
      s"a 7-value column estimates exactly at this cardinality, got $gNdv")
    val (_, tNulls) = merged("tag")
    assert(tNulls === 6000L, "null counts are exact, summed across directories")
  }

  test("the catalog scan reports distinctCount/nullCount into plan statistics") {
    root
    val df = spark.table("gndv.fct")
    val rel = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
    }
    assert(rel.nonEmpty, "catalog read must plan as a DSv2 scan relation")
    val st = rel.head.computeStats()
    assert(st.rowCount.contains(BigInt(60000)), s"manifest-exact rows, got ${st.rowCount}")
    val byName = st.attributeStats.map { case (a, cs) => a.name -> cs }
    val k = byName.get("k").getOrElse(fail("no column statistics for k"))
    assert(k.distinctCount.exists(d =>
      (d - BigInt(60000)).abs <= BigInt(3000)), s"k NDV off: ${k.distinctCount}")
    assert(byName("tag").nullCount.contains(BigInt(6000)))
    assert(byName("grp").distinctCount.contains(BigInt(7)))
    // typed min/max merge across directories (range estimation's input)
    assert(k.min.contains(0L) && k.max.contains(59999L),
      s"k bounds: ${k.min} .. ${k.max}")
    assert(byName("grp").min.contains(0L) && byName("grp").max.contains(6L))
  }

  test("CBO: a point-filtered fact estimates to ~1 row via NDV and becomes the broadcast side") {
    root
    val sql =
      """SELECT f.tag, d.nm FROM gndv.fct f JOIN gndv.dm d ON f.grp = d.dk
        |WHERE f.k = 777""".stripMargin
    def buildSideOutputs(plan: org.apache.spark.sql.execution.SparkPlan): Seq[Set[String]] =
      plan.collect {
        case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
          (b.buildSide match {
            case org.apache.spark.sql.catalyst.optimizer.BuildLeft  => b.left
            case org.apache.spark.sql.catalyst.optimizer.BuildRight => b.right
          }).output.map(_.name).toSet
      }
    val conf = spark.conf
    val prevCbo = conf.get("spark.sql.cbo.enabled")
    val prevThr = conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // threshold below BOTH raw table sizes
      conf.set("spark.sql.autoBroadcastJoinThreshold", "8KB")
      conf.set("spark.sql.cbo.enabled", "false")
      // the fact side's surviving outputs are (grp, tag) — k is pruned
      // after the filter — so "tag" identifies the fact as build side.
      // Since round 15 the point filter broadcasts even in SIZE-ONLY
      // mode: k is an integral stats column, so the scan's
      // frequent-values refinement prices `k = 777` at ~1 row (tracked
      // upper bound / residual tail share) with no CBO flag at all
      val without = buildSideOutputs(spark.sql(sql).queryExecution.sparkPlan)
      assert(without.exists(_.contains("tag")),
        s"size-only mode must already broadcast via the sketch refinement, got $without")
      conf.set("spark.sql.cbo.enabled", "true")
      val withCbo = buildSideOutputs(spark.sql(sql).queryExecution.sparkPlan)
      assert(withCbo.exists(_.contains("tag")),
        "with NDV-fed CBO the k=777 side estimates to ~1 row and must be " +
          s"the broadcast build side, got $withCbo")
      // RANGE selectivity rides the merged typed min/max: k < 40 over
      // [0, 59999] estimates ~40 rows — broadcastable where a size-only
      // estimate is 60k rows of fact
      val rangeSql = "SELECT f.tag, d.nm FROM gndv.fct f JOIN gndv.dm d " +
        "ON f.grp = d.dk WHERE f.k < 40"
      val withRange = buildSideOutputs(spark.sql(rangeSql).queryExecution.sparkPlan)
      assert(withRange.exists(_.contains("tag")),
        s"min/max-fed CBO must broadcast the range-filtered fact, got $withRange")
    } finally {
      conf.set("spark.sql.cbo.enabled", prevCbo)
      conf.set("spark.sql.autoBroadcastJoinThreshold", prevThr)
    }
  }

  test("CALL system.column_stats answers from the manifest alone") {
    root
    val rows = spark.sql("CALL gndv.system.column_stats('fct')")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows.keySet === Set("k", "grp", "tag"))
    assert(rows("grp") === ((7L, 0L)), s"7-value column exact: ${rows("grp")}")
    assert(rows("tag")._2 === 6000L, "null counts are exact")
    assert(math.abs(rows("k")._1 - 60000L) <= 3000L,
      s"60k-unique column within 5%: ${rows("k")._1}")
  }

  test("t$stats metadata table: SELECT-able column statistics, stored-domain bounds") {
    root
    val rows = spark.sql("SELECT * FROM gndv.`fct$stats`").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))).toMap
    assert(rows.keySet === Set("k", "grp", "tag"))
    assert(rows("grp") === ((7L, 0L, "0", "6")))
    // numeric merge, not lexicographic: max across dirs is 59999, and a
    // string compare would have picked "9..."-prefixed renders
    assert(rows("k")._3 === "0" && rows("k")._4 === "59999")
    assert(rows("tag")._2 === 6000L)
    // top_values: merged heavy hitters for string columns — null means
    // no sketch coverage (numerics), empty means covered but no
    // CONFIDENT heavy hitter (tag is near-unique: the honest answer on
    // a flat column is "nothing dominates", never a fabricated top-5)
    val top = spark.sql("SELECT column, top_values FROM gndv.`fct$stats`")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(top("k") != null && top("k").isEmpty,
      "a near-unique integral column is covered but dominated by nothing")
    assert(top("tag") != null && top("tag").isEmpty,
      s"a near-unique string column is covered but dominated by nothing, got '${top("tag")}'")
    // the exact-sum layer's diagnostic face: integral columns report the
    // table's true sum; string columns carry no sum
    val sums = spark.sql("SELECT column, sum FROM gndv.`fct$stats`")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val trueSum = spark.table("gndv.fct")
      .agg(org.apache.spark.sql.functions.expr("sum(cast(k as decimal(38,0)))"))
      .head().getDecimal(0).toBigInteger.toString
    assert(sums("k") != null && new java.math.BigDecimal(sums("k"))
      .toBigInteger.toString === trueSum,
      s"t$$stats sum must be the exact table sum, got ${sums("k")} want $trueSum")
    assert(sums("tag") == null, "string columns carry no sum")
  }

  test("the NDV layer survives a keyed rewrite and a rename re-keys it") {
    val s = spark
    import s.implicits._
    val t = java.nio.file.Files.createTempDirectory("graft_ndv_rw").toString + "/t"
    VersionedLake.appendCommit(
      (1L to 500L).map(i => (i, s"v$i")).toDF("id", "v"), t, statsCols = Seq("id"))
    VersionedLake.upsert(spark, t, Seq((5L, "v5b")).toDF("id", "v"), keys = Seq("id"))
    val v1 = VersionedLake.currentVersion(spark, t).get
    val after = VersionedLake.dirNdv(spark, t, v1)
    assert(after.nonEmpty && after.values.forall(_.contains("id")),
      "rewritten directories recompute their #ndv line in the same commit")
    assert(math.abs(VersionedLake.ndvEstimate(
      after.values.map(_("id")._1).toSeq) - 500L) <= 25L)
    VersionedLake.renameColumn(spark, t, "id", "ident")
    val v2 = VersionedLake.currentVersion(spark, t).get
    val renamed = VersionedLake.dirNdv(spark, t, v2)
    assert(renamed.values.forall(c => c.contains("ident") && !c.contains("id")),
      "a metadata-only rename re-keys the NDV entries with the sketch verbatim")
  }
}
