package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Sink, Source}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

/** Structured Streaming SOURCE over a [[VersionedLake]] commit log —
  * `spark.readStream.format("graft-lake").option("path", dir).load()`
  * turns the lake's append-only manifest history into a micro-batch
  * stream, the composition that closes the loop on the ingest story:
  * one stream `appendCommitTxn`s batches INTO a lake table, another
  * streams the committed rows OUT (index maintenance, downstream view
  * sync, replication) with exactly-once delivery and no coupling to the
  * writer's checkpoints.
  *
  * Design (the same shape as Delta's streaming source, which is also a
  * v1 `Source` — the v1 API's `getBatch` returns a DataFrame, letting
  * the source be a pure composition of the lake's own batch readers):
  *
  *   - '''Offsets are manifest versions.''' `getOffset` reports the
  *     current published version; nothing is invented — the commit log
  *     IS the write-ahead log. Micro-batch (v₁, v₂] is
  *     [[VersionedLake.readAppendedBetween]]: exactly the directories
  *     manifests v₁+1..v₂ appended, planned as one scan. O(delta) per
  *     batch, never a snapshot re-read.
  *   - '''The initial batch is time travel.''' With no start offset the
  *     first batch reads the full snapshot at the observed version
  *     (`startingVersion=earliest`, the default), or begins after a
  *     pinned version (`startingVersion=<n>` / `latest`). Restart
  *     replay is deterministic BY CONSTRUCTION: manifests are immutable,
  *     so re-running (v₁, v₂] yields byte-identical rows — size vacuum
  *     retention above the checkpoint recovery window, the same
  *     contract Delta documents.
  *   - '''Rewrites fail loudly.''' An upsert/delete/compaction between
  *     two offsets is inexpressible in an append-only feed;
  *     `readAppendedBetween`'s guards surface it as an error instead of
  *     silently wrong rows (resync from a fresh initial snapshot, or
  *     feed changes through [[LakeView]] which handles rewrites by
  *     keyed diff). Merge-on-read deletes inside a window are refused
  *     for the same reason.
  *   - '''Schema pins at stream start.''' Columns added by later
  *     commits surface after a restart (the lake's union-by-name
  *     evolution guarantees old directories read with nulls); the live
  *     stream projects the pinned columns, so a sink never sees a
  *     mid-stream schema change.
  *
  * At 100 TB the feed is manifest-metadata-bounded: each `getOffset` is
  * one small-file read, each batch plans only its delta directories —
  * the stream's cost tracks ingest rate, not table size.
  */
class LakeStreamProvider extends StreamSourceProvider with StreamSinkProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-lake"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-lake source requires option 'path'"))

  /** The SINK side — `df.writeStream.format("graft-lake").option("path",
    * dir)` — closing the loop the provider doc describes without a
    * hand-written foreachBatch body. Exactly-once comes from
    * [[VersionedLake.appendCommitTxn]]: the engine's (appId, batchId)
    * pair rides the manifest as a txn watermark, so a batch replayed
    * after a crash-before-checkpoint is a no-op at the COMMIT, not at
    * the write — the lake is the system of record for what landed,
    * exactly the contract ContinuousCurationSpec pins for the manual
    * body. appId defaults to a stable digest of the checkpoint location
    * (the engine's own identity for a restarted query); set
    * option("appId", ...) when two distinct queries share a checkpoint
    * dir lineage. Append mode appends O(delta); Complete mode publishes
    * each batch as a full-snapshot commit (the aggregation-state shape),
    * same txn gate.
    */
  override def createSink(
      sqlContext: SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    val dir = pathOf(parameters)
    val appId = parameters.getOrElse("appId", {
      val ck = parameters.getOrElse("checkpointLocation",
        throw new IllegalArgumentException(
          "graft-lake sink needs option 'appId' or a checkpointLocation"))
      "graft-lake-sink-" + java.security.MessageDigest.getInstance("SHA-256")
        .digest(ck.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    })
    val statsCols = parameters.get("statsCols")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    val complete = outputMode == OutputMode.Complete()
    require(complete || outputMode == OutputMode.Append(),
      s"graft-lake sink supports Append and Complete modes, got $outputMode")
    new LakeStreamSink(dir, appId, partitionColumns, statsCols, complete)
  }

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val spark = sqlContext.sparkSession
    val dir = pathOf(parameters)
    val v = VersionedLake.currentVersion(spark, dir).getOrElse(
      throw new IllegalStateException(
        s"graft-lake source needs at least one published version in $dir"))
    val base = schema.getOrElse(
      VersionedLake.versionSchema(spark, dir, v)
        .getOrElse(VersionedLake.readVersion(spark, dir, v).schema))
    // CDC mode appends the change-event columns to the pinned schema
    val st =
      if (parameters.get("readChanges").exists(_.equalsIgnoreCase("true")))
        base
          .add("_change_type", org.apache.spark.sql.types.StringType, nullable = false)
          .add("_commit_version", org.apache.spark.sql.types.LongType, nullable = false)
      else base
    (shortName(), st)
  }

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source =
    new LakeStreamSource(sqlContext.sparkSession, pathOf(parameters), parameters,
      sourceSchema(sqlContext, schema, providerName, parameters)._2)
}

/** One manifest version as a streaming offset (see
  * [[LakeStreamProvider]]). After a checkpoint restart the engine hands
  * back a `SerializedOffset` wrapping the same json, so consumers parse
  * `offset.json`, never pattern-match the class — the classic v1
  * contract.
  */
final case class LakeVersionOffset(version: Long) extends Offset {
  override def json: String = version.toString
}

/** See [[LakeStreamProvider.createSink]]. */
final class LakeStreamSink(
    tableDir: String,
    appId: String,
    parts: Seq[String],
    statsCols: Seq[String],
    complete: Boolean) extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // rebase off the IncrementalExecution before the commit path plans
    // writes/stats over it (see GraftStreamShim.asBatch)
    val batch = org.apache.spark.sql.graft.GraftStreamShim.asBatch(data.sparkSession, data)
    if (complete)
      VersionedLake.commit(batch, tableDir, parts = parts, statsCols = statsCols,
        txn = Some(appId -> batchId))
    else
      VersionedLake.appendCommitTxn(batch, tableDir, appId, batchId,
        parts = parts, statsCols = statsCols)
    ()
  }

  override def toString: String = s"LakeStreamSink[$tableDir]"
}

class LakeStreamSource(
    spark: SparkSession,
    tableDir: String,
    parameters: Map[String, String],
    pinnedSchema: StructType) extends Source {

  /** Version BEFORE which nothing streams: None = deliver the initial
    * snapshot (earliest); Some(v) = only appends after version v.
    */
  private val startAfter: Option[Long] = parameters.get("startingVersion") match {
    case None | Some("earliest") => None
    case Some("latest")          => VersionedLake.currentVersion(spark, tableDir)
    case Some(n)                 => Some(n.toLong)
  }

  /** CDC mode (`option("readChanges", "true")`): each micro-batch is
    * [[VersionedLake.readRowChanges]] over its version window — exact
    * insert/delete/update_preimage/update_postimage events instead of
    * appended rows. Merge-on-read mutations stream as row-level events
    * (where the append-only default refuses them); copy-on-write
    * mutations — including SQL MERGE/UPDATE/DELETE — stream from their
    * commit-time change artifacts; layout- and metadata-only versions
    * (optimize, rename/drop column) contribute empty batches; only
    * artifact-less rewrites (rollback, snapshot replaces) fail loudly.
    * The initial `earliest` batch is the history from v0 —
    * deterministic under replay like everything else here: manifests
    * are immutable (artifacts ride vacuum retention with their
    * manifests; size retention above the checkpoint recovery window).
    */
  private val readChanges: Boolean =
    parameters.get("readChanges").exists(_.equalsIgnoreCase("true"))

  override def schema: StructType = pinnedSchema

  private def versionOf(o: Offset): Long = o.json.trim.toLong

  override def getOffset: Option[Offset] = {
    val cur = VersionedLake.currentVersion(spark, tableDir)
    (cur, startAfter) match {
      // nothing published past the pinned start -> no data yet (an empty
      // first batch would checkpoint an offset for rows never delivered)
      case (Some(c), Some(s)) if c <= s => None
      case (Some(c), _)                 => Some(LakeVersionOffset(c))
      case (None, _)                    => None
    }
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endV = versionOf(end)
    val batch = (start.map(versionOf), startAfter) match {
      // steady state: exactly the directories appended in (fromV, endV]
      case (Some(fromV), _) if fromV >= endV =>
        // engine replays an empty range on some restarts — empty frame,
        // same pinned schema
        spark.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](), pinnedSchema)
      case (Some(fromV), _) =>
        if (readChanges) VersionedLake.readRowChanges(spark, tableDir, fromV, endV)
        else VersionedLake.readAppendedBetween(spark, tableDir, fromV, endV)
      case (None, Some(s)) if s >= endV =>
        spark.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](), pinnedSchema)
      case (None, Some(s)) =>
        if (readChanges) VersionedLake.readRowChanges(spark, tableDir, s, endV)
        else VersionedLake.readAppendedBetween(spark, tableDir, s, endV)
      // first batch, earliest: the full snapshot AT endV (or, in CDC
      // mode, the event history from v0) — deterministic under replay
      // because it is time travel, not "current"
      case (None, None) =>
        if (readChanges) VersionedLake.readRowChanges(spark, tableDir, -1L, endV)
        else VersionedLake.readVersion(spark, tableDir, endV)
    }
    // pin the stream-start columns (later commits may have added more)
    // and flag the plan streaming for MicroBatchExecution
    org.apache.spark.sql.graft.GraftStreamShim.asStreaming(
      spark, batch.select(pinnedSchema.fieldNames.map(col).toSeq: _*))
  }

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  override def toString: String = s"LakeStreamSource[$tableDir]"
}
