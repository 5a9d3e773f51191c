package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Equi-height histograms off the manifest: every stats-layered commit
  * writes per-directory quantile edges (an `"e"` array riding the same
  * `#ndv` JSON, computed in the SAME aggregation pass), and the catalog
  * scan merges the kept directories' edge sets into ONE mixture-CDF
  * equi-height histogram reported through DSv2 `columnStats`. The payoff
  * is SKEW-correct range selectivity: on a column where 90% of the rows
  * live in 0.1% of the value range, min/max-uniform estimation prices
  * `v <= hot` at ~0.1% and mis-plans every join above it; the histogram
  * prices it at ~90%. At 100 TB that is the difference between
  * broadcasting a 90 GB "tiny" side and shuffling it.
  */
class HistogramStatsSpec extends SparkSpec {

  // 90% of rows in [0, 9), 10% spread to 99990: one hot band, a long
  // tail of two decades — the shape uniform estimation gets wrong by
  // three orders of magnitude
  private lazy val root: String = {
    val r = java.nio.file.Files.createTempDirectory("graft_hist").toString
    spark.conf.set("spark.sql.catalog.ghist", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.ghist.root", r)
    val rows = spark.range(0, 10000).select(
      col("id").as("k"),
      when(col("id") % 10 =!= 0, col("id") % 9)
        .otherwise(col("id") * 10).as("v"))
    val t = s"$r/skw"
    VersionedLake.appendCommit(rows.filter(col("k") < 5000), t,
      statsCols = Seq("v"))
    VersionedLake.appendCommit(rows.filter(col("k") >= 5000), t,
      statsCols = Seq("v"))
    r
  }

  test("per-directory edges round-trip and are ascending") {
    val t = s"$root/skw"
    val v = VersionedLake.currentVersion(spark, t).get
    val hist = VersionedLake.dirHist(spark, t, v)
    assert(hist.size === 2, "both appended directories carry edge arrays")
    hist.values.foreach { cols =>
      val es = cols.getOrElse("v", fail("no edges for v"))
      assert(es.length === VersionedLake.HistBins + 1)
      assert(es.sliding(2).forall(p => p(0) <= p(1)), "edges ascend")
      assert(es.head === 0.0 && es.last > 9000.0,
        s"edges span the full domain: ${es.head} .. ${es.last}")
    }
  }

  test("the merged histogram reaches plan statistics and prices the hot band") {
    root
    val df = spark.table("ghist.skw")
    val rel = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
    }
    assert(rel.nonEmpty)
    val byName = rel.head.computeStats().attributeStats
      .map { case (a, cs) => a.name -> cs }
    val vStats = byName.getOrElse("v", fail("no column statistics for v"))
    val h = vStats.histogram.getOrElse(fail("no histogram for v"))
    assert(h.bins.length === VersionedLake.HistBins)
    assert(math.abs(h.height * h.bins.length - 10000.0) < 1.0,
      s"equi-height over all non-null rows, height=${h.height}")
    // ≥90% of the mass sits below 9, so at most ~4 of 32 bins may
    // stretch past the hot band
    val hotBins = h.bins.count(_.hi <= 9.0)
    assert(hotBins >= 24, s"the hot band must dominate the bins, got $hotBins")
    // CBO range estimate: truth is 9000 rows (90%); uniform min/max
    // estimation would say ~0.01% (9/90010). Require the histogram's
    // answer to land the right ORDER — above half the table.
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val filtered = spark.sql("SELECT * FROM ghist.skw WHERE v <= 8")
      val est = filtered.queryExecution.optimizedPlan.stats.rowCount
      assert(est.exists(_ > BigInt(5000)),
        s"skew-aware estimate must price the hot band, got $est")
      // 9000 ids with id%10 != 0, plus id=0 whose tail value 0*10 = 0
      assert(filtered.count() === 9001L, "the truth the estimate approximates")
    } finally spark.conf.set("spark.sql.cbo.enabled", prevCbo)
  }
}
