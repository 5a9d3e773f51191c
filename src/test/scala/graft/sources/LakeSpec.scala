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
}
