package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Persisted incremental materialized view contract: maintenance reads
  * only the corpus directories new since the last sync (manifest diff),
  * progress rides the state commit (exactly-once), rewrites trigger a
  * rebuild rather than a wrong merge, and compaction bounds the
  * read-side merge fan-in without losing the watermark.
  */
class LakeViewSpec extends SparkSpec {

  private val s = spark
  import s.implicits._

  private def batch(ids: Range) =
    ids.map(i => (i.toLong, s"g${i % 3}", i * 1.5)).toDF("id", "g", "amount")

  private def stateOf(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("g").agg(
      count(lit(1)).as("n"),
      sum(col("amount")).as("total"),
      min(col("id")).as("first_id"))

  private val mergeOps = Seq("n" -> "sum", "total" -> "sum", "first_id" -> "min")

  private def render(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Double, Long)] =
    df.collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap

  private def recomputed(corpusDir: String): Map[String, (Long, Double, Long)] =
    render(stateOf(VersionedLake.read(s, corpusDir)))

  test("sync maintains the view O(delta); the view always equals a recompute") {
    val corpusDir = java.nio.file.Files.createTempDirectory("lview_corpus").toString
    val viewDir = java.nio.file.Files.createTempDirectory("lview_state").toString
    val batches = Seq(batch(0 until 200), batch(200 until 260), batch(260 until 500))
    batches.zipWithIndex.foreach { case (b, i) =>
      VersionedLake.appendCommit(b, corpusDir)
      assert(LakeView.sync(s, corpusDir, viewDir, stateOf) === Some(i.toLong))
      assert(render(LakeView.read(s, viewDir, Seq("g"), mergeOps)) === recomputed(corpusDir),
        s"after sync $i the merged view must equal a full recompute")
    }
    // O(delta): three syncs = three state commits, each appending one frame
    val vV = VersionedLake.currentVersion(s, viewDir).get
    assert(vV === 2L)
    assert(VersionedLake.manifest(s, viewDir, vV).size === 3,
      "each sync must append one partial-state dir, never rewrite the view")
    // replayed sync no-ops (watermark gates it)
    assert(LakeView.sync(s, corpusDir, viewDir, stateOf) === Some(2L))
    assert(VersionedLake.currentVersion(s, viewDir).get === vV)
  }

  test("a corpus rewrite rebuilds the view; appends afterwards resume incrementally") {
    val corpusDir = java.nio.file.Files.createTempDirectory("lview_rw_corpus").toString
    val viewDir = java.nio.file.Files.createTempDirectory("lview_rw_state").toString
    VersionedLake.appendCommit(batch(0 until 100), corpusDir)
    VersionedLake.appendCommit(batch(100 until 200), corpusDir)
    LakeView.sync(s, corpusDir, viewDir, stateOf)
    // rewrite: partial states cannot retract folded-in rows
    VersionedLake.deleteWhere(s, corpusDir, col("id") < 50L)
    assert(LakeView.sync(s, corpusDir, viewDir, stateOf) === Some(2L))
    assert(render(LakeView.read(s, viewDir, Seq("g"), mergeOps)) === recomputed(corpusDir),
      "a rewrite must rebuild, not merge stale partials")
    assert(VersionedLake.manifest(s, viewDir,
      VersionedLake.currentVersion(s, viewDir).get).size === 1,
      "the rebuild publishes one fresh snapshot frame")
    // the rebuild's exactly-once gate: replaying it no-ops
    val vAfter = VersionedLake.currentVersion(s, viewDir).get
    assert(LakeView.sync(s, corpusDir, viewDir, stateOf) === Some(2L))
    assert(VersionedLake.currentVersion(s, viewDir).get === vAfter)
    // incremental maintenance resumes after the rebuild
    VersionedLake.appendCommit(batch(200 until 250), corpusDir)
    assert(LakeView.sync(s, corpusDir, viewDir, stateOf) === Some(3L))
    assert(render(LakeView.read(s, viewDir, Seq("g"), mergeOps)) === recomputed(corpusDir))
  }

  test("retractOf: rewrites maintain via signed CDC deltas, not a rebuild") {
    val corpusDir = java.nio.file.Files.createTempDirectory("lview_ret_corpus").toString
    val viewDir = java.nio.file.Files.createTempDirectory("lview_ret_view").toString
    // LINEAR state only (count/sum) — the retractable algebra
    def linState(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("g").agg(count(lit(1)).as("n"), sum(col("amount")).as("total"))
    def linRetract(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("g").agg(
        (-count(lit(1))).as("n"), (-sum(col("amount"))).as("total"))
    val linOps = Seq("n" -> "sum", "total" -> "sum")
    // liveness = the count column: fully-retracted groups must DISAPPEAR
    // like a recompute, not linger as (g, 0, 0.0) ghosts
    def answer = LakeView.read(s, viewDir, Seq("g"), linOps, liveness = Some("n"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    def truth = linState(VersionedLake.read(s, corpusDir))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

    VersionedLake.appendCommit(batch(0 until 30), corpusDir)
    LakeView.sync(s, corpusDir, viewDir, linState, Some(linRetract)): Unit
    val framesBefore = VersionedLake.manifest(s, viewDir,
      VersionedLake.currentVersion(s, viewDir).get)
    // CoW delete + upsert rewrite corpus dirs; the view must append ONE
    // signed delta frame per sync — every prior partial carries verbatim
    // (a rebuild would have replaced them with a single snapshot frame)
    VersionedLake.deleteWhere(s, corpusDir, col("id") < 5)
    LakeView.sync(s, corpusDir, viewDir, linState, Some(linRetract)): Unit
    assert(answer === truth, "signed retraction must equal a recompute after a delete")
    VersionedLake.upsert(s, corpusDir,
      batch(10 until 12).withColumn("amount", col("amount") * 10), keys = Seq("id"))
    LakeView.sync(s, corpusDir, viewDir, linState, Some(linRetract)): Unit
    assert(answer === truth, "update = retract pre-image + add post-image")
    val framesAfter = VersionedLake.manifest(s, viewDir,
      VersionedLake.currentVersion(s, viewDir).get)
    assert(framesBefore.forall(framesAfter.contains),
      "incremental maintenance: prior partial frames carry verbatim, no rebuild")
    // a compaction-only window appends an EMPTY delta and stays correct
    VersionedLake.optimize(s, corpusDir)
    LakeView.sync(s, corpusDir, viewDir, linState, Some(linRetract)): Unit
    assert(answer === truth)
    // delete an ENTIRE group: its state cancels to zero and the liveness
    // filter drops it — answer ≡ recompute, which has no such group
    VersionedLake.deleteWhere(s, corpusDir, col("g") === "g1")
    LakeView.sync(s, corpusDir, viewDir, linState, Some(linRetract)): Unit
    assert(!truth.contains("g1") && answer === truth,
      "a fully-retracted group must vanish from the view like a recompute")
    // without retractOf the same shape would have rebuilt (snapshot
    // commit) — pin the contract still holds for that path too
    VersionedLake.deleteWhere(s, corpusDir, col("id") === 20L)
    LakeView.sync(s, corpusDir, viewDir, linState): Unit
    assert(answer === truth, "the rebuild fallback stays the honest default")
  }

  test("net-zero window advances the watermark metadata-only; MoR deletes rebuild") {
    val corpusDir = java.nio.file.Files.createTempDirectory("lview_nz_corpus").toString
    val viewDir = java.nio.file.Files.createTempDirectory("lview_nz_state").toString
    VersionedLake.appendCommit(batch(0 until 200), corpusDir)
    assert(LakeView.sync(s, corpusDir, viewDir, stateOf) === Some(0L))
    val v0 = VersionedLake.currentVersion(s, viewDir).get
    // append a batch, then CoW-delete exactly those rows: the window's
    // NET dir diff is empty but the corpus version moved — the sync must
    // advance the watermark (previously it returned success while the
    // watermark wedged behind forever) WITHOUT rebuilding state
    VersionedLake.appendCommit(batch(900 until 910), corpusDir)
    VersionedLake.deleteWhere(s, corpusDir, col("id") >= 900L): Unit
    assert(LakeView.sync(s, corpusDir, viewDir, stateOf) === Some(2L))
    assert(LakeView.watermark(s, viewDir) === Some(2L),
      "net-zero window must still advance the watermark")
    assert(VersionedLake.manifest(s, viewDir, VersionedLake.currentVersion(s, viewDir).get)
      === VersionedLake.manifest(s, viewDir, v0),
      "net-zero advance must be metadata-only: state dirs untouched")
    assert(render(LakeView.read(s, viewDir, Seq("g"), mergeOps)) === recomputed(corpusDir))
    // a MERGE-ON-READ delete changes logical rows with ZERO dir changes —
    // the dir diff alone is blind to it; the eq-delete set must trigger
    // the rewrite path or the view silently keeps counting deleted rows
    VersionedLake.deleteKeysMor(s, corpusDir,
      batch(0 until 10).select("id"), keys = Seq("id")): Unit
    LakeView.sync(s, corpusDir, viewDir, stateOf)
    assert(LakeView.watermark(s, viewDir) === VersionedLake.currentVersion(s, corpusDir))
    assert(render(LakeView.read(s, viewDir, Seq("g"), mergeOps)) === recomputed(corpusDir),
      "a MoR delete in the window must reach the view")
  }

  test("compact collapses partials, keeps the answer and the watermark") {
    val corpusDir = java.nio.file.Files.createTempDirectory("lview_cp_corpus").toString
    val viewDir = java.nio.file.Files.createTempDirectory("lview_cp_state").toString
    (0 until 4).foreach { i =>
      VersionedLake.appendCommit(batch(i * 50 until (i + 1) * 50), corpusDir)
      LakeView.sync(s, corpusDir, viewDir, stateOf)
    }
    val before = render(LakeView.read(s, viewDir, Seq("g"), mergeOps))
    LakeView.compact(s, viewDir, Seq("g"), mergeOps)
    val vV = VersionedLake.currentVersion(s, viewDir).get
    assert(VersionedLake.manifest(s, viewDir, vV).size === 1,
      "compaction must collapse the partial frames into one")
    assert(render(LakeView.read(s, viewDir, Seq("g"), mergeOps)) === before)
    // the watermark survived compaction: a replayed sync still no-ops
    assert(LakeView.sync(s, corpusDir, viewDir, stateOf) === Some(3L))
    assert(VersionedLake.currentVersion(s, viewDir).get === vV)
    // and future appends keep maintaining incrementally on the compacted state
    VersionedLake.appendCommit(batch(200 until 260), corpusDir)
    LakeView.sync(s, corpusDir, viewDir, stateOf)
    assert(render(LakeView.read(s, viewDir, Seq("g"), mergeOps)) === recomputed(corpusDir))
  }
}
