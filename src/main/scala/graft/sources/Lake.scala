package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned data-lake table layout — the physical design that makes the
  * 100 TB math work. A table partitioned on a low-cardinality predicate
  * column (date, source, language) turns `WHERE dt = ...` into directory
  * pruning: the scan never opens non-matching files, so cost tracks the
  * queried slice, not the table.
  *
  * Two layout decisions both matter at scale:
  *
  *   1. '''Partition directories''' (`partitionBy`): coarse pruning via
  *      `PartitionFilters` — zero I/O for excluded partitions.
  *   2. '''In-file clustering''' (`sortWithinPartitions` before write):
  *      parquet row-group min/max stats on the sort column become
  *      effective zone maps, so selective predicates inside a partition
  *      skip row groups too (`PushedFilters` + rowgroup stats).
  *
  * The repartition-on-partition-columns before write is the small-file
  * compaction step: without it every upstream task writes a file into
  * every partition directory (tasks × partitions files — the classic
  * small-file explosion); with it each partition directory gets exactly
  * one writer task, and `maxRecordsPerFile` re-splits only genuinely
  * oversized partitions.
  *
  * Mirrors the reference's one-directory-per-run archive layout
  * (`/root/reference/xml_to_rdb.py:35-52`) re-expressed as a columnar
  * lake table instead of a processed-files folder.
  */
object Lake {

  /** Write `df` as a partitioned parquet table with one compacted file per
    * partition directory (capped by `maxRecordsPerFile`), clustered within
    * files on `clusterBy` for row-group stat pruning.
    */
  def writePartitioned(
      df: DataFrame,
      path: String,
      parts: Seq[String],
      clusterBy: Seq[String] = Nil,
      maxRecordsPerFile: Long = 8L * 1000 * 1000): Unit =
    write(df, path, parts, clusterBy, maxRecordsPerFile, "overwrite")

  /** Same layout, append mode — the `foreachBatch` body for a streaming
    * ingest into the lake: each micro-batch adds at most one file per
    * touched partition directory, so the layout stays compacted without a
    * separate compaction job (file count grows with batches, not tasks ×
    * batches; periodic rewrite handles the long tail).
    */
  def appendPartitioned(
      df: DataFrame,
      path: String,
      parts: Seq[String],
      clusterBy: Seq[String] = Nil,
      maxRecordsPerFile: Long = 8L * 1000 * 1000): Unit =
    write(df, path, parts, clusterBy, maxRecordsPerFile, "append")

  private def write(
      df: DataFrame,
      path: String,
      parts: Seq[String],
      clusterBy: Seq[String],
      maxRecordsPerFile: Long,
      mode: String): Unit = {
    val one = df.repartition(parts.map(col): _*)
    val clustered =
      if (clusterBy.isEmpty) one
      else one.sortWithinPartitions((parts ++ clusterBy).map(col): _*)
    clustered.write
      .mode(mode)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(parts: _*)
      .parquet(path)
  }

  /** Read a lake table back; partition columns come from directory names,
    * so predicates on them prune at planning time (assert via
    * `PartitionFilters` in the plan / `df.inputFiles`).
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Copy-on-write upsert (Delta/Hudi-style MERGE for a plain parquet
    * lake): rows in `updates` replace same-`keys` rows, others append —
    * and ONLY partitions that receive updates are read or rewritten.
    *
    * The scale math: cost is O(touched partitions), not O(table). The
    * existing side is pruned to touched partitions with a broadcast semi
    * join on the partition columns (directory pruning — at 100 TB with
    * daily partitions, an update slice touching 3 days reads 3 days); the
    * survivor set (existing rows whose key is NOT updated) comes from a
    * per-partition anti join; the rewrite uses dynamic partition
    * overwrite, so untouched directories are never listed, read, or
    * replaced.
    *
    * The merged slice is materialized (localCheckpoint) before the write
    * because the write overwrites directories the plan reads from — the
    * no-snapshot-isolation reality of a bare-parquet lake. A table format
    * with a transaction log removes that materialization; the
    * partition-pruned MERGE shape is identical.
    */
  def upsertPartitioned(
      spark: SparkSession,
      path: String,
      updates: DataFrame,
      parts: Seq[String],
      keys: Seq[String],
      clusterBy: Seq[String] = Nil,
      maxRecordsPerFile: Long = 8L * 1000 * 1000): Unit = {
    val touched = updates.select(parts.map(col): _*).distinct()
    val affected = read(spark, path)
      .join(broadcast(touched), parts, "left_semi")
    val survivors = affected.join(updates.select(keys.map(col): _*), keys, "left_anti")
    val merged = survivors.unionByName(updates).localCheckpoint()

    val conf = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(conf)
    spark.conf.set(conf, "dynamic")
    try write(merged, path, parts, clusterBy, maxRecordsPerFile, "overwrite")
    finally prev match {
      case Some(v) => spark.conf.set(conf, v)
      case None => spark.conf.unset(conf)
    }
  }
}
