package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mirror-table replication off the row-level CDC feed: `sync` brings a
  * destination lake table up to the source's current version by reading
  * the commit log's row delta ONCE and applying it as ONE exactly-once
  * keyed minimal-CoW commit — the lakehouse "APPLY CHANGES" shape
  * (reference behavior: the pipeline republishes whole extracts into the
  * warehouse per run, `/root/reference/parser/exporter.py:60-104` — at
  * 100 TB a mirror must pay the row delta, not the table).
  *
  * Cost model, which is the point: a sync window spanning V commits with
  * D changed rows costs O(D) feed read (artifact-backed CoW versions are
  * ONE multi-path scan, [[VersionedLake.readRowChanges]]), one O(D)
  * latest-per-key window shuffle, and a keyed-CoW upsert that rewrites
  * only directories holding touched keys. The mirror's own history is a
  * clean per-sync commit log — itself CDC-consumable, so mirrors chain.
  *
  * Exactly-once: the applied SOURCE version rides the destination
  * manifest as a txn watermark (`appId` defaults to a digest of the
  * source path; pass one explicitly when two distinct sources share a
  * physical path lineage, e.g. a path re-mounted under another root). A
  * replayed or raced sync whose window already landed is a no-op AT THE
  * COMMIT — the lake is the system of record for what applied.
  *
  * Latest-per-key, not per-row: within the window each key's newest
  * commit decides (delete XOR upsert — the feed classifies key-granular
  * per version, so the two cannot tie). ALL final-version rows of a key
  * ride the batch, so sources that legitimately hold several rows per
  * key (append-heavy tables) replicate exactly: the keyed upsert
  * replaces the mirror's rows of that key with the full set.
  *
  * The window must be row-level replayable: sources with CDC artifacts
  * opted out (`cdc.artifacts=false`) refuse loudly in the feed read —
  * route replicated tables through artifact-carrying mutations.
  */
object LakeReplicate {

  /** Stable watermark identity for a source path (mirrors the streaming
    * sink's checkpoint-digest convention).
    */
  def defaultAppId(srcDir: String): String =
    "graft-replicate-" + java.security.MessageDigest.getInstance("SHA-256")
      .digest(srcDir.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString

  /** Sync `dstDir` to `srcDir`'s current version. Returns the
    * destination version holding the sync (the current one when the
    * window was empty or already applied).
    *
    * First call bootstraps: the source snapshot lands as one append
    * commit carrying the same watermark discipline, so an interrupted
    * bootstrap retries idempotently. Later calls read only
    * `(applied, current]`.
    */
  def sync(
      spark: SparkSession,
      srcDir: String,
      dstDir: String,
      keys: Seq[String],
      appId: Option[String] = None): Long = {
    require(keys.nonEmpty, "replication needs the source's key columns")
    val app = appId.getOrElse(defaultAppId(srcDir))
    val srcV = VersionedLake.currentVersion(spark, srcDir)
      .getOrElse(throw new IllegalStateException(s"no published version in $srcDir"))
    VersionedLake.currentVersion(spark, dstDir) match {
      case None =>
        // bootstrap: snapshot at srcV, watermarked so a crash between
        // commit and caller-visible return replays as a no-op
        VersionedLake.appendCommitTxn(
          VersionedLake.readVersion(spark, srcDir, srcV), dstDir,
          appId = app, batchId = srcV, statsCols = keys)
      case Some(dstV) =>
        val applied = VersionedLake.txnWatermarks(spark, dstDir, dstV)
          .getOrElse(app, throw new IllegalStateException(
            s"$dstDir exists but carries no '$app' watermark - it was not " +
              "bootstrapped by this replication (syncing into an unrelated " +
              "table would silently merge two histories; start from an " +
              "empty destination)"))
        if (applied >= srcV) return dstV // nothing new - no commit, no probe
        applyDelta(spark,
          VersionedLake.readRowChanges(spark, srcDir, applied, srcV),
          dstDir, keys, app, batchId = srcV)
    }
  }

  /** Apply ONE CDC delta frame (rows carrying `_change_type` /
    * `_commit_version` — a [[VersionedLake.readRowChanges]] window or a
    * `readChanges` stream micro-batch) into `dstDir` as one exactly-once
    * keyed commit: the `foreachBatch` body for CONTINUOUS replication.
    *
    * {{{
    * spark.readStream.format("graft-lake")
    *   .option("path", src).option("readChanges", "true").load()
    *   .writeStream.option("checkpointLocation", ck)
    *   .foreachBatch { (delta, id) =>
    *     LakeReplicate.applyDelta(spark, delta, dst, keys, appId, id): Unit
    *   }.start()
    * }}}
    *
    * A first batch onto an empty destination bootstraps (the stream's
    * initial batch IS the snapshot as inserts); deletes of keys the
    * destination never held are no-ops by key-equality. Exactly-once:
    * `batchId` rides the destination manifest, so the engine's replay
    * after a crash-before-checkpoint commits nothing twice.
    */
  def applyDelta(
      spark: SparkSession,
      delta: DataFrame,
      dstDir: String,
      keys: Seq[String],
      appId: String,
      batchId: Long): Long = {
    val feed = delta.filter(col("_change_type") =!= "update_preimage")
    // newest commit per key decides; all rows of that (key, commit)
    // ride, so multi-row keys replicate whole
    val latest = feed
      .withColumn("_rep_max_v",
        max(col("_commit_version")).over(Window.partitionBy(keys.map(col): _*)))
      .filter(col("_commit_version") === col("_rep_max_v"))
    val dataCols = feed.columns
      .filterNot(Set("_change_type", "_commit_version", "_rep_max_v")).toSeq
    val batch = latest.filter(col("_change_type") =!= "delete")
      .select(dataCols.map(col): _*)
    VersionedLake.currentVersion(spark, dstDir) match {
      case None =>
        // bootstrap: reduced inserts only (a delete with no surviving
        // row is already absence)
        VersionedLake.appendCommitTxn(batch, dstDir,
          appId = appId, batchId = batchId, statsCols = keys)
      case Some(_) =>
        val touched = latest.select(keys.map(col): _*).distinct()
        // ONE commit: upserted keys rewrite with their new rows, probed
        // keys the batch does not re-supply (the deletes) vanish
        VersionedLake.upsert(spark, dstDir, batch, keys,
          txn = Some(appId -> batchId), probeKeys = Some(touched))
    }
  }

  /** The mirror's applied source version, if bootstrapped. */
  def appliedVersion(
      spark: SparkSession,
      srcDir: String,
      dstDir: String,
      appId: Option[String] = None): Option[Long] =
    VersionedLake.currentVersion(spark, dstDir).flatMap(v =>
      VersionedLake.txnWatermarks(spark, dstDir, v)
        .get(appId.getOrElse(defaultAppId(srcDir))))

  /** Convenience: sync and read the mirror — the query-facing face. */
  def synced(
      spark: SparkSession,
      srcDir: String,
      dstDir: String,
      keys: Seq[String]): DataFrame = {
    sync(spark, srcDir, dstDir, keys)
    VersionedLake.read(spark, dstDir)
  }
}
