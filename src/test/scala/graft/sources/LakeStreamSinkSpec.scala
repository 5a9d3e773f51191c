package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The lake-as-streaming-SINK contract: `writeStream.format("graft-lake")`
  * commits each micro-batch through the txn-gated lake paths — appends in
  * Append mode, full snapshots in Complete mode — and a replayed batch id
  * is a no-op at the commit, so restart-after-crash cannot double rows.
  */
class LakeStreamSinkSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("append mode: each micro-batch is one O(delta) lake commit") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val dir = tmp("lsink")
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("id", "tag")
      .writeStream.format("graft-lake")
      .option("path", dir)
      .option("checkpointLocation", tmp("lsink_ck"))
      .outputMode("append").start()
    try {
      in.addData((1L, "a"), (2L, "b")); q.processAllAvailable()
      in.addData((3L, "c")); q.processAllAvailable()
      val got = VersionedLake.read(s, dir).collect().map(_.getLong(0)).toSet
      assert(got === Set(1L, 2L, 3L))
      assert(VersionedLake.currentVersion(s, dir).contains(1L),
        "two micro-batches -> versions 0 and 1")
    } finally q.stop()
  }

  test("replayed batch ids no-op: restart from an older checkpoint cannot double rows") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val dir = tmp("lsink_once")
    val sink = new LakeStreamSink(dir, "once-app", Nil, Nil, complete = false)
    sink.addBatch(0L, Seq((1L, "a"), (2L, "b")).toDF("id", "tag"))
    sink.addBatch(1L, Seq((3L, "c")).toDF("id", "tag"))
    // crash-replay of both batches (engine re-delivers after checkpoint loss)
    sink.addBatch(0L, Seq((1L, "a"), (2L, "b")).toDF("id", "tag"))
    sink.addBatch(1L, Seq((3L, "c")).toDF("id", "tag"))
    assert(VersionedLake.read(s, dir).count() === 3,
      "replays must be no-ops at the commit")
    assert(VersionedLake.currentVersion(s, dir).contains(1L))
  }

  test("complete mode: each batch publishes the aggregation state as a snapshot") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val dir = tmp("lsink_cm")
    val in = MemoryStream[(String, Long)]
    val q = in.toDF().toDF("k", "v")
      .groupBy("k").agg(sum("v").as("total"))
      .writeStream.format("graft-lake")
      .option("path", dir)
      .option("checkpointLocation", tmp("lsink_cm_ck"))
      .outputMode("complete").start()
    try {
      in.addData(("a", 1L), ("a", 2L), ("b", 10L)); q.processAllAvailable()
      in.addData(("a", 4L)); q.processAllAvailable()
      val got = VersionedLake.read(s, dir).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === Map("a" -> 7L, "b" -> 10L),
        "current version must be the LATEST state, not an append pile")
      // and the previous state is time-travelable
      val v0 = VersionedLake.readVersion(s, dir, 0).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(v0 === Map("a" -> 3L, "b" -> 10L))
    } finally q.stop()
  }

  test("round trip: stream INTO the lake, stream OUT of the same lake") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val dir = tmp("lsink_rt")
    val in = MemoryStream[(Long, String)]
    val wq = in.toDF().toDF("id", "tag")
      .writeStream.format("graft-lake")
      .option("path", dir)
      .option("checkpointLocation", tmp("lsink_rt_wck"))
      .outputMode("append").start()
    try {
      in.addData((1L, "a"), (2L, "b")); wq.processAllAvailable()
      val rq = s.readStream.format("graft-lake").option("path", dir).load()
        .writeStream.format("memory").queryName("lsink_rt_out")
        .option("checkpointLocation", tmp("lsink_rt_rck"))
        .outputMode("append").start()
      try {
        rq.processAllAvailable()
        in.addData((3L, "c")); wq.processAllAvailable()
        rq.processAllAvailable()
        assert(s.table("lsink_rt_out").collect().map(_.getLong(0)).toSet === Set(1L, 2L, 3L))
      } finally rq.stop()
    } finally wq.stop()
  }
}
