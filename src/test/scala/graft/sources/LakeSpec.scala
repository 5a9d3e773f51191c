package graft.sources

import graft.SparkSpec
import graft.engine.Session
import org.apache.spark.sql.functions._

/** Partitioned lake layout: compaction (one file per partition dir),
  * partition pruning at planning time, and row-group clustering.
  */
class LakeSpec extends SparkSpec {

  private lazy val path = {
    val dir = java.nio.file.Files.createTempDirectory("lake").toString
    val ev = Session
      .events(spark, sf)
      .withColumn("dt", date_format(col("ts"), "yyyy-MM-dd"))
      .select("event_id", "user_id", "event_type", "value", "dt")
    Lake.writePartitioned(ev, dir, parts = Seq("dt"), clusterBy = Seq("user_id"))
    dir
  }

  test("one compacted parquet file per partition directory") {
    val dirs = new java.io.File(path)
      .listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("dt="))
    assert(dirs.nonEmpty, "expected dt= partition directories")
    dirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length === 1,
        s"${d.getName}: expected 1 compacted file, found ${files.length}")
    }
  }

  test("partition predicate prunes to one directory's files at planning time") {
    val dts = Lake.read(spark, path).select(col("dt").cast("string")).distinct()
      .collect().map(_.getString(0)).sorted
    assert(dts.length > 1, "fixture must span multiple partitions")
    val one = Lake.read(spark, path).filter(col("dt") === dts.head)
    one.collect()
    // the scan's numFiles metric counts files actually opened — excluded
    // partitions never are, the property that bounds scan cost by the
    // queried slice at 100 TB.
    val scan = one.queryExecution.executedPlan
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .head
    assert(scan.metrics("numFiles").value === 1L,
      s"expected 1 file opened, saw ${scan.metrics("numFiles").value}")
    val planStr = one.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters: [isnotnull(dt"), planStr.take(500))
  }

  test("round-trips rows and partition values") {
    val back = Lake.read(spark, path)
    val orig = Session.events(spark, sf)
    assert(back.count() === orig.count())
    // dt values reconstructed from directory names match the derivation
    val origDt = orig
      .select(col("event_id"), date_format(col("ts"), "yyyy-MM-dd").as("dt"))
    val mismatches = back.select(col("event_id"), col("dt").as("dt_lake"))
      .join(origDt, "event_id")
      .filter(col("dt_lake") =!= col("dt"))
      .count()
    assert(mismatches === 0)
  }

  test("streaming foreachBatch appends into the partitioned layout, pruning intact") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("lake_stream").toString
    val in = MemoryStream[(Long, String, Double)]
    val q = in.toDF().toDF("event_id", "dt", "value")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Lake.appendPartitioned(batch, dir, parts = Seq("dt"))
      }
      .start()
    try {
      in.addData((1L, "2024-01-01", 1.0), (2L, "2024-01-02", 2.0))
      q.processAllAvailable()
      in.addData((3L, "2024-01-01", 3.0))
      q.processAllAvailable()
    } finally q.stop()
    val back = Lake.read(spark, dir)
    assert(back.count() === 3)
    // per-partition file count grows with touched batches, not tasks
    val d1 = new java.io.File(s"$dir/dt=2024-01-01")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(d1 === 2, s"dt=2024-01-01 expected 2 batch files, saw $d1")
    val one = back.filter(col("dt") === "2024-01-01")
    one.collect()
    val scan = one.queryExecution.executedPlan
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .head
    assert(scan.metrics("numFiles").value === 2L)
  }

  test("clustering sorts user_id within each partition file") {
    // row-group stats only help if the file really is sorted; read one
    // partition in file order and check monotonic user_id.
    val dts = Lake.read(spark, path).select(col("dt").cast("string")).distinct()
      .collect().map(_.getString(0)).sorted
    val ids = spark.read
      .parquet(s"$path/dt=${dts.head}")
      .select("user_id")
      .collect()
      .map(_.getLong(0))
    assert(ids.sameElements(ids.sorted), "user_id must be sorted within the file")
  }

  test("copy-on-write upsert rewrites ONLY touched partitions, merges by key") {
    val s = spark
    import s.implicits._
    // fresh table: 2 partitions, 2 rows each
    val dir = java.nio.file.Files.createTempDirectory("lake_upsert").toString
    val base = Seq(
      (1L, "a", "2024-01-01"), (2L, "b", "2024-01-01"),
      (3L, "c", "2024-01-02"), (4L, "d", "2024-01-02"))
      .toDF("id", "v", "dt")
    Lake.writePartitioned(base, dir, parts = Seq("dt"))
    def fileOf(dt: String): java.io.File =
      new java.io.File(s"$dir/dt=$dt").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
    val untouchedBefore = fileOf("2024-01-02")

    // update id=1, insert id=5 — both land in the 2024-01-01 partition
    val updates = Seq((1L, "a2", "2024-01-01"), (5L, "e", "2024-01-01"))
      .toDF("id", "v", "dt")
    Lake.upsertPartitioned(spark, dir, updates, parts = Seq("dt"), keys = Seq("id"))

    val rows = Lake.read(spark, dir)
      .select(col("id"), col("v"), col("dt").cast("string"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(rows === Set(
      (1L, "a2", "2024-01-01"), (2L, "b", "2024-01-01"), (5L, "e", "2024-01-01"),
      (3L, "c", "2024-01-02"), (4L, "d", "2024-01-02")))

    val untouchedAfter = fileOf("2024-01-02")
    assert(untouchedAfter.getName === untouchedBefore.getName &&
      untouchedAfter.lastModified === untouchedBefore.lastModified,
      "the 2024-01-02 partition must not be rewritten")
    assert(fileOf("2024-01-01").getName !== untouchedBefore.getName)
  }

  /** Per-row-group (min, max) of an INT column from the REAL parquet
    * footers — the statistics the reader's row-group pruning consults.
    */
  private def rowGroupStats(dir: String, colName: String): Seq[(Int, Int)] = {
    import scala.jdk.CollectionConverters._
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sparkContext.hadoopConfiguration
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).toSeq
    files.flatMap { f =>
      val rdr = ParquetFileReader.open(
        HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf))
      try rdr.getFooter.getBlocks.asScala.toSeq.map { b =>
        val cc = b.getColumns.asScala.find(_.getPath.toDotString == colName).get
        val st = cc.getStatistics
        (st.genericGetMin.asInstanceOf[Number].intValue,
          st.genericGetMax.asInstanceOf[Number].intValue)
      } finally rdr.close()
    }
  }

  test("Z-order clustering makes row-group stats prune on the SECOND column too") {
    val s = spark
    import s.implicits._
    // 10k points uniform over a 100x100 (x, y) grid; 500-row files → ~20
    // row groups. A y-band predicate (5% selectivity) can skip a row
    // group iff the group's y-range misses the band — the decision the
    // parquet reader makes from exactly these footer stats.
    val rnd = new scala.util.Random(5)
    val rows = Seq.fill(10000)((rnd.nextInt(100), rnd.nextInt(100), rnd.nextInt()))
    val df = rows.toDF("x", "y", "payload").withColumn("p", lit("all"))
    def skippable(stats: Seq[(Int, Int)], lo: Int, hi: Int): Double =
      stats.count { case (mn, mx) => mx < lo || mn > hi }.toDouble / stats.size
    def bandAvg(stats: Seq[(Int, Int)]): Double = {
      // average skippable fraction over every 5-wide y band — selectivity
      // evidence independent of any single band's luck
      val bands = (0 until 95 by 5).map(v => skippable(stats, v, v + 4))
      bands.sum / bands.size
    }

    val lexDir = java.nio.file.Files.createTempDirectory("lake_lex").toString
    Lake.writePartitioned(df, lexDir, Seq("p"), clusterBy = Seq("x", "y"),
      maxRecordsPerFile = 500L)
    val zDir = java.nio.file.Files.createTempDirectory("lake_z").toString
    Lake.writePartitioned(df, zDir, Seq("p"), zorderBy = Seq("x", "y"),
      maxRecordsPerFile = 500L)

    val lexY = rowGroupStats(s"$lexDir/p=all", "y")
    val zY = rowGroupStats(s"$zDir/p=all", "y")
    assert(zY.size >= 10, s"want many row groups, got ${zY.size}")
    val (lexFrac, zFrac) = (bandAvg(lexY), bandAvg(zY))
    info(f"avg skippable row-group fraction for 5%%-selective y bands: " +
      f"lex=$lexFrac%.2f zorder=$zFrac%.2f x-under-zorder=${bandAvg(rowGroupStats(s"$zDir/p=all", "x"))}%.2f")
    // lexicographic (x, y): x dominates the sort, each group's y-range
    // spans ~everything → nothing skips. Z-order: every group covers a
    // narrow y-window → most bands skip most groups.
    assert(lexFrac <= 0.10, s"lex clusterBy unexpectedly prunes y: $lexFrac")
    assert(zFrac >= 0.40, s"zorder must prune y bands, got $zFrac")
    // and the leading column keeps (most of) its own pruning power
    val zX = rowGroupStats(s"$zDir/p=all", "x")
    assert(bandAvg(zX) >= 0.40, s"zorder must still prune x bands, got ${bandAvg(zX)}")

    // correctness: identical row multiset back from both layouts
    val a = Lake.read(s, lexDir).select("x", "y", "payload").collect().toSeq.groupBy(identity)
    val b = Lake.read(s, zDir).select("x", "y", "payload").collect().toSeq.groupBy(identity)
    assert(a.view.mapValues(_.size).toMap === b.view.mapValues(_.size).toMap)
  }

  test("zorderBy rank-buckets skewed columns (quantile, not min/max scaling)") {
    val s = spark
    import s.implicits._
    // 99% of x mass in [0, 10), 1% outliers at 1e9: linear min/max
    // scaling would put ALL mass in bucket 0 and the z-key would carry no
    // x information; quantile bucketing must still spread x.
    val rnd = new scala.util.Random(23)
    val rows = Seq.fill(8000)(
      (if (rnd.nextInt(100) == 0) 1000000000 else rnd.nextInt(10), rnd.nextInt(100)))
    val df = rows.toDF("x", "y")
    val keyed = Lake.withZorderKey(df, Seq("x", "y"))
    // x=0..9 must land in MANY distinct buckets → many distinct z-keys
    // among rows with identical y
    val perY = keyed.filter(col("y") === 50)
      .select("_graft_zkey").distinct().count()
    assert(perY >= 5, s"quantile bucketing must spread the skewed column, got $perY keys")
  }
}
