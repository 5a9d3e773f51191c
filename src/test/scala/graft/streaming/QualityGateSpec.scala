package graft.streaming

import graft.SparkSpec
import graft.operators.Quality
import graft.operators.Quality.RowCheck
import graft.sources.VersionedLake
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import java.sql.Timestamp

/** The streaming ADMISSION GATE a continuous-curation loop runs in front
  * of its lake: every micro-batch passes the declarative DQ suite
  * (operators.Quality — one aggregation pass) inside foreachBatch, and
  * only clean batches become atomically-published VersionedLake commits.
  * A failing batch publishes NOTHING (the lake's crashed-writer
  * invisibility does the isolation) and the stream keeps running — the
  * gate quarantines data, it does not wedge ingestion.
  */
class QualityGateSpec extends SparkSpec {

  private def t(min: Long): Timestamp = new Timestamp(min * 60000L)

  test("foreachBatch DQ gate: only clean batches publish lake versions") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("vlake_gate").toString
    val rejected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val in = MemoryStream[Ev]
    val q = in.toDS().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Ev], id: Long) =>
        val df = batch.toDF()
        val violations = Quality.suite(df, Seq(
          RowCheck("value_nonneg", col("value") < 0),
          RowCheck("type_domain",
            !col("event_type").isin("click", "view", "purchase", "signup", "error"))))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val bad = violations.values.sum
        if (bad == 0L && !df.isEmpty) VersionedLake.appendCommit(df, dir)
        else if (bad > 0L) rejected += ((id, bad))
        ()
      }
      .start()
    try {
      // batch 0: clean → version published
      in.addData(Ev("a", 1, "click", t(1), 1.0), Ev("b", 2, "view", t(2), 2.0))
      q.processAllAvailable()
      val v0 = VersionedLake.currentVersion(s, dir)
      assert(v0.isDefined, "clean batch must publish")
      assert(VersionedLake.read(s, dir).count() === 2)

      // batch 1: negative value + bogus type → NOTHING publishes
      in.addData(Ev("c", 3, "click", t(3), -5.0), Ev("d", 4, "hack", t(4), 1.0))
      q.processAllAvailable()
      assert(VersionedLake.currentVersion(s, dir) === v0,
        "a failing batch must not advance the published version")
      assert(VersionedLake.read(s, dir).count() === 2,
        "readers must never see quarantined rows")
      assert(rejected.map(_._2).sum === 2L, s"two violations expected: $rejected")

      // batch 2: clean again → ingestion continues past the quarantine
      in.addData(Ev("e", 5, "purchase", t(5), 3.0))
      q.processAllAvailable()
      assert(VersionedLake.currentVersion(s, dir).get > v0.get)
      assert(VersionedLake.read(s, dir).count() === 3,
        "post-quarantine commit = clean rows only (bad batch fully absent)")
    } finally q.stop()
  }
}
