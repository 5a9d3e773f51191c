package org.apache.spark.sql.graft

import java.util.OptionalLong

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, Statistics, SupportsReportPartitioning, SupportsReportStatistics}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.vectorized.ColumnarBatch

/** STORAGE-PARTITIONED JOIN for lake tables: the delegated parquet scan,
  * re-reported to Spark as `KeyGroupedPartitioning` over the table's hive
  * partition columns so that a join (or aggregation) keyed on those
  * columns plans with NO shuffle on this side — at 100 TB the two
  * full-table exchanges ARE the cost of a fact⋈fact join, and two lake
  * tables co-partitioned on the join key skip both, Iceberg-style.
  *
  * Mechanics: every `PartitionedFile` the inner scan planned already
  * carries its hive partition values; this wrapper regroups those split
  * files BY partition value and tags each resulting file bin with its key
  * ([[HasPartitionKey]]). Spark's `BatchScanExec` then groups the bins
  * per key (one RDD partition per live partition value) and
  * `EnsureRequirements` matches the two sides' key sets — with
  * `spark.sql.sources.v2.bucketing.pushPartValues.enabled` filling
  * one-sided gaps with empty partitions instead of falling back to a
  * shuffle. Within a key the bins keep the inner scan's split
  * granularity, so a single RDD partition still streams its files
  * sequentially only when key-grouping is actually in force.
  *
  * The tradeoff this wrapper prices in (and why it is OPT-IN via the
  * `spj.enabled` table property rather than automatic): while a scan
  * reports key-grouping, Spark reads it one-task-per-live-partition-value
  * EVERY time (`spark.sql.sources.v2.bucketing.enabled` is plan-wide, not
  * join-scoped), so the declaring table trades intra-partition scan
  * parallelism for shuffle-free joins — the same contract bucketing makes
  * with its bucket count. Declare it on tables whose live partition count
  * comfortably exceeds cluster parallelism (date-partitioned facts), not
  * on 4-partition dimensions. Two scan-level guards keep degenerate
  * shapes off the path even when declared: a pruned scan that kept fewer
  * than two partition values reverts to the stock bin-packed read (a
  * 1-key group would serialize the scan for nothing), and a projection
  * that dropped any partition column reverts too (the key is no longer
  * recoverable from the planned files).
  *
  * The reference never faces this problem — one pandas process joins in
  * memory (/root/reference/parser/xml.py:214-232); this is the
  * distributed answer to the same "join without paying data movement"
  * requirement.
  */
object KeyGroupedLakeScan {

  /** Wrap `inner` with key-grouped reporting when the structure allows:
    * all `clusterCols` survive into the scan's partition schema and at
    * least two distinct partition values were planned. Returns None when
    * the stock scan should stand.
    */
  def tryWrap(
      spark: SparkSession,
      inner: Scan,
      clusterCols: Seq[String],
      stats: Option[(Long, Long)]): Option[Scan] = inner match {
    case ps: ParquetScan if clusterCols.nonEmpty =>
      val partSchema = ps.readPartitionSchema
      val resolver = spark.sessionState.analyzer.resolver
      val idx = clusterCols.map(c => partSchema.fields.indexWhere(f => resolver(f.name, c)))
      if (idx.exists(_ < 0)) return None // a partition column was pruned out
      val types = idx.map(partSchema.fields(_).dataType)
      // planInputPartitions here moves split planning from execution to
      // planning time — unavoidable: the rule that records key-grouping
      // (V2ScanPartitioningAndOrdering) needs the group count during
      // planning anyway. No duplicate I/O: the file listing lives in the
      // scan's shared InMemoryFileIndex, and a stand-down returns the
      // SAME scan instance, whose planned partitions simply recompute
      // from that cached listing at execution.
      val files = ps.toBatch.planInputPartitions().toSeq.flatMap {
        case fp: FilePartition => fp.files.toSeq
        case _                 => return None // non-file partition: stand down
      }
      // group split files by their (copied) partition-key values; the
      // grouping key is a Seq so equals/hashCode are value-based for
      // UTF8String/boxed atomics alike
      val grouped = files.groupBy { f =>
        idx.zip(types).map { case (i, dt) =>
          if (f.partitionValues.isNullAt(i)) null else f.partitionValues.get(i, dt)
        }
      }
      if (grouped.size < 2) return None // 1-key grouping would serialize the scan
      val maxSplit = FilePartition.maxSplitBytes(
        spark, files.map(_.length).sum)
      val groups = grouped.toSeq.map { case (key, fs) =>
        val row: InternalRow = new GenericInternalRow(key.toArray[Any])
        row -> FilePartition.getFilePartitions(spark, fs, maxSplit)
      }
      // exact-case names from the partition schema so V2ExpressionUtils
      // resolves the identity transforms against the scan output cleanly
      val names = idx.map(partSchema.fields(_).name)
      Some(new KeyGroupedLakeScan(ps, names, groups, stats))
    case _ => None
  }

  /** One bin of split files, all from ONE hive partition value. */
  private final class KeyedFiles(val key: InternalRow, val bin: FilePartition)
      extends InputPartition with HasPartitionKey {
    override def partitionKey(): InternalRow = key
    override def preferredLocations(): Array[String] = bin.preferredLocations()
  }

  /** The inner parquet reader factory, fed the unwrapped file bins. */
  private final class Unwrapping(inner: PartitionReaderFactory)
      extends PartitionReaderFactory {
    private def bin(p: InputPartition): InputPartition =
      p.asInstanceOf[KeyedFiles].bin
    override def createReader(p: InputPartition): PartitionReader[InternalRow] =
      inner.createReader(bin(p))
    override def createColumnarReader(p: InputPartition): PartitionReader[ColumnarBatch] =
      inner.createColumnarReader(bin(p))
    override def supportColumnarReads(p: InputPartition): Boolean =
      inner.supportColumnarReads(bin(p))
  }
}

/** The wrapped scan. Statistics stay manifest-exact when provided (same
  * contract as [[LakePruningScanBuilder.ManifestStatsScan]]); otherwise
  * estimation delegates to the parquet scan's own file-size numbers.
  */
final class KeyGroupedLakeScan private (
    private val inner: ParquetScan,
    private val clusterCols: Seq[String],
    groups: Seq[(InternalRow, Seq[FilePartition])],
    stats: Option[(Long, Long)])
    extends Scan with Batch
    with SupportsReportPartitioning with SupportsReportStatistics {

  import KeyGroupedLakeScan.{KeyedFiles, Unwrapping}

  override def readSchema(): StructType = inner.readSchema()
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftKeyGroupedScan(${clusterCols.mkString(",")}, ${groups.size} keys) " +
      inner.description()
  override def columnarSupportMode(): Scan.ColumnarSupportMode =
    inner.columnarSupportMode()

  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(
      clusterCols.map(Expressions.identity).toArray, groups.size)

  override def planInputPartitions(): Array[InputPartition] =
    groups.flatMap { case (key, bins) => bins.map(new KeyedFiles(key, _)) }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new Unwrapping(inner.createReaderFactory())

  override def estimateStatistics(): Statistics = stats match {
    case Some((rows, bytes)) => new Statistics {
      override def sizeInBytes(): OptionalLong = OptionalLong.of(bytes)
      override def numRows(): OptionalLong = OptionalLong.of(rows)
    }
    case None => inner.estimateStatistics()
  }

  // exchange/scan reuse keys on scan equality, like ManifestStatsScan
  override def equals(other: Any): Boolean = other match {
    case s: KeyGroupedLakeScan => inner == s.inner && clusterCols == s.clusterCols
    case _                     => false
  }
  override def hashCode(): Int = (inner, clusterCols).hashCode()
}
