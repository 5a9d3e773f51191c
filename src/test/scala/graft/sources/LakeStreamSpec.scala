package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The lake-as-streaming-source contract: manifest versions are offsets,
  * micro-batches are manifest-diff reads, restarts replay exactly-once
  * from the checkpoint, and rewrites fail loudly instead of feeding
  * wrong rows.
  */
class LakeStreamSpec extends SparkSpec {

  private def ids(rows: Array[org.apache.spark.sql.Row]): Set[Long] =
    rows.map(_.getAs[Long]("id")).toSet

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("initial snapshot then O(delta) increments, via the registered short name") {
    val s = spark
    import s.implicits._
    val dir = tmp("lstream")
    VersionedLake.appendCommit(Seq((1L, "a"), (2L, "b")).toDF("id", "payload"), dir)
    VersionedLake.appendCommit(Seq((3L, "c")).toDF("id", "payload"), dir)
    val q = s.readStream.format("graft-lake").option("path", dir).load()
      .writeStream.format("memory").queryName("lake_feed").outputMode("append")
      .option("checkpointLocation", tmp("lstream_ck")).start()
    try {
      q.processAllAvailable()
      assert(ids(s.table("lake_feed").collect()) === Set(1L, 2L, 3L),
        "first batch must be the full snapshot at the observed version")
      // two more commits while the stream runs -> delivered incrementally
      VersionedLake.appendCommit(Seq((4L, "d")).toDF("id", "payload"), dir)
      q.processAllAvailable()
      VersionedLake.appendCommit(Seq((5L, "e")).toDF("id", "payload"), dir)
      q.processAllAvailable()
      assert(ids(s.table("lake_feed").collect()) === Set(1L, 2L, 3L, 4L, 5L))
      assert(s.table("lake_feed").count() === 5,
        "each row exactly once - no snapshot re-delivery on later batches")
    } finally q.stop()
  }

  test("checkpoint restart resumes at the committed offset, exactly-once") {
    val s = spark
    import s.implicits._
    val dir = tmp("lstream_rs")
    val ck = tmp("lstream_rs_ck")
    val out = tmp("lstream_rs_out")
    VersionedLake.appendCommit(Seq((1L, "a")).toDF("id", "payload"), dir)
    // a fault-tolerant sink (memory forbids recovery): the parquet file
    // sink's commit log makes delivered-row counting restart-exact
    def start() =
      s.readStream.format("graft-lake").option("path", dir).load()
        .writeStream.format("parquet").outputMode("append")
        .option("path", out).option("checkpointLocation", ck).start()
    val q1 = start()
    try { q1.processAllAvailable() } finally q1.stop()
    assert(ids(s.read.parquet(out).collect()) === Set(1L))
    // rows committed while the stream was DOWN arrive on restart - and
    // the initial snapshot does NOT replay (offset v0 is checkpointed)
    VersionedLake.appendCommit(Seq((2L, "b")).toDF("id", "payload"), dir)
    VersionedLake.appendCommit(Seq((3L, "c")).toDF("id", "payload"), dir)
    val q2 = start()
    try { q2.processAllAvailable() } finally q2.stop()
    val rows = s.read.parquet(out).collect()
    assert(ids(rows) === Set(1L, 2L, 3L) && rows.length === 3,
      "restart must deliver exactly the appends since the checkpoint, once each")
  }

  test("startingVersion=latest skips history; explicit version starts mid-log") {
    val s = spark
    import s.implicits._
    val dir = tmp("lstream_sv")
    VersionedLake.appendCommit(Seq((1L, "a")).toDF("id", "payload"), dir) // v0
    VersionedLake.appendCommit(Seq((2L, "b")).toDF("id", "payload"), dir) // v1
    val q = s.readStream.format("graft-lake")
      .option("path", dir).option("startingVersion", "latest").load()
      .writeStream.format("memory").queryName("lake_sv").outputMode("append")
      .option("checkpointLocation", tmp("lstream_sv_ck")).start()
    try {
      q.processAllAvailable()
      assert(s.table("lake_sv").count() === 0, "history must not stream")
      VersionedLake.appendCommit(Seq((3L, "c")).toDF("id", "payload"), dir) // v2
      q.processAllAvailable()
      assert(ids(s.table("lake_sv").collect()) === Set(3L))
    } finally q.stop()
    val q2 = s.readStream.format("graft-lake")
      .option("path", dir).option("startingVersion", "0").load()
      .writeStream.format("memory").queryName("lake_sv0").outputMode("append")
      .option("checkpointLocation", tmp("lstream_sv0_ck")).start()
    try {
      q2.processAllAvailable()
      assert(ids(s.table("lake_sv0").collect()) === Set(2L, 3L),
        "startingVersion=0 means appends AFTER version 0")
    } finally q2.stop()
  }

  test("a rewrite between offsets fails the stream instead of feeding wrong rows") {
    val s = spark
    import s.implicits._
    val dir = tmp("lstream_rw")
    VersionedLake.appendCommit(Seq((1L, "a"), (2L, "b")).toDF("id", "payload"), dir,
      statsCols = Seq("id"))
    val q = s.readStream.format("graft-lake").option("path", dir).load()
      .writeStream.format("memory").queryName("lake_rw").outputMode("append")
      .option("checkpointLocation", tmp("lstream_rw_ck")).start()
    try {
      q.processAllAvailable()
      VersionedLake.deleteWhere(s, dir, col("id") === 1L) // rewrite commit
      VersionedLake.appendCommit(Seq((3L, "c")).toDF("id", "payload"), dir)
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(e.getMessage.contains("rewrote") || Option(e.getCause).exists(
        c => String.valueOf(c.getMessage).contains("rewrote")),
        s"the failure must name the rewrite, got: ${e.getMessage}")
    } finally q.stop()
  }

  test("closing the loop: stream out of a lake another stream commits into") {
    val s = spark
    import s.implicits._
    val dir = tmp("lstream_loop")
    VersionedLake.appendCommit(Seq((0L, "seed")).toDF("id", "payload"), dir)
    // downstream: a streaming aggregation OVER the lake feed
    val agg = s.readStream.format("graft-lake").option("path", dir).load()
      .groupBy().agg(count(lit(1)).as("n"), sum("id").as("total"))
    val q = agg.writeStream.format("memory").queryName("lake_loop")
      .outputMode("complete")
      .option("checkpointLocation", tmp("lstream_loop_ck")).start()
    try {
      q.processAllAvailable()
      // upstream: exactly-once ingest commits (a replay must not double)
      VersionedLake.appendCommitTxn(Seq((10L, "x")).toDF("id", "payload"), dir,
        appId = "loop-ingest", batchId = 1L)
      VersionedLake.appendCommitTxn(Seq((10L, "x")).toDF("id", "payload"), dir,
        appId = "loop-ingest", batchId = 1L) // replay -> no-op
      VersionedLake.appendCommitTxn(Seq((20L, "y")).toDF("id", "payload"), dir,
        appId = "loop-ingest", batchId = 2L)
      q.processAllAvailable()
      val r = s.table("lake_loop").head()
      assert(r.getAs[Long]("n") === 3L && r.getAs[Long]("total") === 30L,
        "the feed must see each committed batch exactly once")
    } finally q.stop()
  }
  test("readChanges mode streams row-level CDC events across MoR mutations") {
    val s = spark
    import s.implicits._
    val dir = tmp("lstream_cdc")
    VersionedLake.appendCommit(Seq((1L, "a"), (2L, "b")).toDF("id", "payload"), dir)
    val q = s.readStream.format("graft-lake")
      .option("path", dir).option("readChanges", "true").load()
      .writeStream.format("memory").queryName("lake_cdc_feed").outputMode("append")
      .option("checkpointLocation", tmp("lstream_cdc_ck")).start()
    try {
      q.processAllAvailable()
      def events = s.table("lake_cdc_feed").collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[String]("payload"),
          r.getAs[String]("_change_type"), r.getAs[Long]("_commit_version")))
        .toSet
      assert(events === Set(
        (1L, "a", "insert", 0L), (2L, "b", "insert", 0L)),
        "initial batch is the v0 history as inserts")
      // a merge-on-read upsert streams as update events — where the
      // append-only default would refuse the window
      VersionedLake.upsertMor(s, dir,
        Seq((2L, "b2"), (7L, "g")).toDF("id", "payload"), keys = Seq("id"))
      q.processAllAvailable()
      assert(events === Set(
        (1L, "a", "insert", 0L), (2L, "b", "insert", 0L),
        (2L, "b", "update_preimage", 1L), (2L, "b2", "update_postimage", 1L),
        (7L, "g", "insert", 1L)))
      VersionedLake.deleteKeysMor(s, dir, Seq(1L).toDF("id"), Seq("id"))
      q.processAllAvailable()
      assert(events.contains((1L, "a", "delete", 2L)))
      assert(events.size === 6, "exactly one event per logical change")
      // COPY-ON-WRITE mutations stream from their commit-time change
      // artifacts — previously a loud stream failure; the SQL DML paths
      // ride these same ops, so a stream can follow a SQL-mutated table
      VersionedLake.materializeDeletes(s, dir): Unit // v3: emits nothing
      VersionedLake.upsert(s, dir,
        Seq((7L, "g2"), (9L, "i")).toDF("id", "payload"), keys = Seq("id"))
      q.processAllAvailable()
      assert(events.contains((7L, "g", "update_preimage", 4L)))
      assert(events.contains((7L, "g2", "update_postimage", 4L)))
      assert(events.contains((9L, "i", "insert", 4L)))
      VersionedLake.deleteWhere(s, dir, col("id") === 2L)
      q.processAllAvailable()
      assert(events.contains((2L, "b2", "delete", 5L)))
      assert(events.size === 10, "CoW events exactly once, nothing phantom")
    } finally q.stop()
  }
}
