package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SIZE-ONLY range selectivity off the histogram edges: every
  * stats-layered commit already writes `HistBins+1` equi-height quantile
  * edges per numeric (and now temporal) column into the `#ndv` manifest
  * layer; the catalog scan prices a pushed `>`/`<`/BETWEEN conjunct off
  * the kept directories' row-weighted mixture CDF and refines its
  * REPORTED rows/bytes — no CBO flag. The single most common curation
  * filter (date windows, score thresholds) now drives broadcast
  * decisions in the planner's default mode, where the alternative is
  * the raw kept-directory sum, off by orders of magnitude on a skewed
  * column.
  */
class RangeStatsSpec extends SparkSpec {

  private def reportedRows(df: org.apache.spark.sql.DataFrame): BigInt = {
    val rel = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
    }
    assert(rel.nonEmpty, "catalog read must plan as a DSv2 scan relation")
    rel.head.computeStats().rowCount.getOrElse(fail("no row count reported"))
  }

  private lazy val root: String = {
    val r = java.nio.file.Files.createTempDirectory("graft_rng").toString
    spark.conf.set("spark.sql.catalog.grng", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.grng.root", r)
    // violently skewed v: 99.5% of rows in [0,9), a 300-row tail strung
    // out to 60000 — the q_join_cbo_hist distribution, two directories
    val fact = spark.range(0, 60000).select(
      col("id").as("k"),
      when(col("id") % 200 === 0, col("id")).otherwise(col("id") % 9).as("v"))
    val f = s"$r/fct"
    VersionedLake.appendCommit(fact.filter(col("k") < 30000), f,
      statsCols = Seq("k", "v"))
    VersionedLake.appendCommit(fact.filter(col("k") >= 30000), f,
      statsCols = Seq("k", "v"))
    r
  }

  test("a tail range prices at ~one histogram bin, the bulk range near-full, no CBO flag") {
    root
    val tail = reportedRows(spark.table("grng.fct").filter(col("v") > 8))
    // true 299; the histogram floor is one bin of each dir (~1/32) plus
    // CDF interpolation — well under a tenth of the table either way
    assert(tail <= BigInt(6000),
      s"tail range must price off the mixture CDF (true 299, raw 60000), got $tail")
    val bulk = reportedRows(spark.table("grng.fct").filter(col("v") >= 0))
    assert(bulk === BigInt(60000), s"an all-covering range keeps full rows, got $bulk")
    // conjunct pair = BETWEEN: both bounds tighten ONE interval
    val between = reportedRows(
      spark.table("grng.fct").filter(col("v") >= 2 && col("v") < 5))
    assert(between >= BigInt(12000) && between <= BigInt(28000),
      s"v in [2,5) over a ~uniform [0,9) bulk is ~1/3 of 60000, got $between")
  }

  test("conservatism: one directory without edges blocks range refinement") {
    val r = java.nio.file.Files.createTempDirectory("graft_rng2").toString
    spark.conf.set("spark.sql.catalog.grng2", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.grng2.root", r)
    val f = s"$r/t"
    val mk = (lo: Long, hi: Long) => spark.range(lo, hi).select(
      col("id").as("k"), (col("id") % 9).as("v"))
    VersionedLake.appendCommit(mk(0, 10000), f, statsCols = Seq("v"))
    VersionedLake.appendCommit(mk(10000, 20000), f) // no stats layer
    val rows = reportedRows(spark.table("grng2.t").filter(col("v") > 7))
    assert(rows === BigInt(20000),
      s"a dir without edges must block refinement (raw rows), got $rows")
  }

  test("DATE columns: histogram edges on epoch days price a date window; the freq sketch prices a point date") {
    val r = java.nio.file.Files.createTempDirectory("graft_rng3").toString
    spark.conf.set("spark.sql.catalog.grng3", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.grng3.root", r)
    val f = s"$r/t"
    // 95% of rows on one heavy day, a 97-day rare tail — the
    // daily-skewed corpus shape
    VersionedLake.appendCommit(
      spark.range(0, 40000).select(
        col("id").as("k"),
        when(col("id") % 20 === 0,
          date_add(to_date(lit("1995-01-01")), (col("id") % 97).cast("int")))
          .otherwise(to_date(lit("1995-01-01"))).as("d")),
      f, statsCols = Seq("d"))
    // point equality on a rare day: the temporal freq sketch must price
    // ~tail share (true ~21), never uniform-over-NDV (~408)
    val rare = reportedRows(
      spark.table("grng3.t").filter(col("d") === lit("1995-01-14").cast("date")))
    assert(rare <= BigInt(2000),
      s"rare date must price within the tail (true ~21), got $rare")
    val heavy = reportedRows(
      spark.table("grng3.t").filter(col("d") === lit("1995-01-01").cast("date")))
    assert(heavy >= BigInt(35000),
      s"the heavy day must price ~95% of 40000, got $heavy")
    // a date WINDOW prices off the epoch-day histogram edges: days
    // 1995-01-02 .. 1995-04-07 hold only the 5% tail
    val window = reportedRows(
      spark.table("grng3.t").filter(col("d") > lit("1995-01-01").cast("date")))
    assert(window <= BigInt(8000),
      s"the tail date window must price off the CDF (true ~1980), got $window")
  }

  test("TIMESTAMP columns sketch and histogram on epoch micros") {
    val r = java.nio.file.Files.createTempDirectory("graft_rng4").toString
    spark.conf.set("spark.sql.catalog.grng4", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.grng4.root", r)
    val f = s"$r/t"
    // heavy hour vs a thin tail of later hours
    VersionedLake.appendCommit(
      spark.range(0, 40000).select(
        col("id").as("k"),
        when(col("id") % 20 === 0,
          expr("timestampadd(HOUR, CAST(id % 97 AS INT) + 1, " +
            "to_timestamp('1995-01-01 00:00:00'))"))
          .otherwise(to_timestamp(lit("1995-01-01 00:00:00"))).as("ts")),
      f, statsCols = Seq("ts"))
    val window = reportedRows(spark.table("grng4.t")
      .filter(col("ts") >= lit("1995-01-01 00:30:00").cast("timestamp")))
    assert(window <= BigInt(8000),
      s"the tail timestamp window must price off the CDF (true 2000), got $window")
    val heavy = reportedRows(spark.table("grng4.t")
      .filter(col("ts") === lit("1995-01-01 00:00:00").cast("timestamp")))
    assert(heavy >= BigInt(35000),
      s"the heavy instant must price ~95% through the session-TZ render, got $heavy")
  }

  test("CALL system.estimate_rows inherits range pricing through the shared pipeline") {
    root
    val est = spark.sql(
      "CALL grng.system.estimate_rows('fct', 'v > 8')").head().getLong(0)
    assert(est <= 6000L && est >= 1L,
      s"the SQL face must report the histogram-refined range estimate, got $est")
  }

  test("estimate_rows: a claimed-exact conjunct reports the EXACT count even when the CDF could also price it") {
    // a directory-uniform column carries BOTH proofs: uniform stats
    // (claimable-exact) and histogram edges (CDF-priceable). The exact
    // path must win, mirroring the plan's own decision order — the same
    // filter stays CDF-priced on a table where the column is NOT uniform.
    root
    val r = java.nio.file.Files.createTempDirectory("graft_rng5").toString
    spark.conf.set("spark.sql.catalog.grng5", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.grng5.root", r)
    val u = s"$r/uni"
    // per-directory uniform `day`: 40 / 25 / 35 rows
    Seq((10L, 40), (20L, 25), (30L, 35)).foreach { case (day, n) =>
      VersionedLake.appendCommit(
        spark.range(0, n).select(col("id").as("k"), lit(day).as("day")),
        u, statsCols = Seq("day", "k"))
    }
    val exact = spark.sql(
      "CALL grng5.system.estimate_rows('uni', 'day = 20')").head().getLong(0)
    assert(exact === 25L,
      s"a claimable equality must report the exact satisfying-row sum, got $exact")
    // range shape on the uniform column: still decided exactly (20 and 30)
    val exactRange = spark.sql(
      "CALL grng5.system.estimate_rows('uni', 'day >= 20')").head().getLong(0)
    assert(exactRange === 60L,
      s"a claimable range must report the exact sum, got $exactRange")
    // the non-uniform table cannot claim: the estimate is sketch/CDF
    // PRICED — refined below the raw kept-dir sum, never the raw 60000
    val approx = spark.sql(
      "CALL grng.system.estimate_rows('fct', 'v = 3')").head().getLong(0)
    assert(approx > 0L && approx < 60000L,
      s"a non-uniform equality prices off the sketch/CDF layers, got $approx")
    // HYBRID estimate, mirroring the plan's hybrid claims: proven dirs
    // count exactly, the residual (mixed) dir prices off its own layers
    VersionedLake.appendCommit(
      spark.range(0, 10).select(col("id").as("k"),
        when(col("id") < 7, lit(20L)).otherwise(lit(30L)).as("day")),
      u, statsCols = Seq("day", "k"))
    val hyb = spark.sql(
      "CALL grng5.system.estimate_rows('uni', 'day = 20')").head().getLong(0)
    assert(hyb >= 25L && hyb <= 35L,
      s"exact 25 from the proven dir + a priced estimate of the mixed dir's ~7, got $hyb")
  }
}
