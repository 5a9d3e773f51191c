package org.apache.spark.sql.graft

import java.util.OptionalLong

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder, Statistics, SupportsPushDownAggregates, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.execution.datasources.DataSourceStrategy
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The catalog scan with MANIFEST-level directory pruning in front of
  * the stock parquet scan: Spark pushes the query's data filters here
  * (the `private[sql]` catalyst-filter channel file sources use — the
  * reason this class lives in the shim package), the lake's
  * stats/bloom layer decides which committed directories can possibly
  * hold matches, and only THOSE directories feed the delegated
  * `ParquetTable` builder — which then re-applies the same filters for
  * its own partition pruning and parquet row-group skipping. Every
  * filter is also returned to Spark as a post-scan filter, so pruning
  * can only skip work, never rows. The net read path for a point
  * SELECT on a 100 TB table: manifest stats/bloom (directories) →
  * hive partitions → parquet footers (row groups) → vectorized decode.
  *
  * Two further manifest-powered layers ride the same builder:
  *
  *   - METADATA-ONLY AGGREGATES ([[SupportsPushDownAggregates]]): an
  *     unfiltered, un-grouped `count(*)`/`min`/`max` the `#rows`/`#stats`
  *     lines can answer exactly becomes a [[LocalScan]] — the 100 TB
  *     table is never opened, not even its footers. Spark only offers
  *     aggregates here when no post-scan filters remain, and this
  *     builder keeps every filter post-scan, so a filtered aggregate
  *     can never reach the metadata path by construction.
  *   - EXACT STATISTICS ([[SupportsReportStatistics]] on the returned
  *     scan): row/byte totals of the KEPT directories from the manifest,
  *     so Catalyst's join planning sees exact numbers without listing a
  *     single file — a small lake table auto-broadcasts with no hint.
  */
final class LakePruningScanBuilder(
    spark: SparkSession,
    identName: String,
    dataRoot: String,
    schema: StructType,
    options: CaseInsensitiveStringMap,
    pruner: Seq[Filter] => Seq[String],
    rowMeta: Map[String, (Long, Long)] = Map.empty,
    aggAnswer: Aggregation => Option[(StructType, Array[Any])] = _ => None)
    extends ScanBuilder
    with SupportsPushDownCatalystFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {

  private var pushed: Seq[Expression] = Nil
  private var required: StructType = schema
  private var answered: Option[(StructType, Array[Any])] = None

  // Spark probes supportCompletePushDown THEN pushAggregation with the
  // same Aggregation instance; aggAnswer re-reads the manifest on the
  // driver, so memoize by identity instead of paying the metadata I/O
  // twice per metadata-answerable query.
  private var aggCache: Option[(Aggregation, Option[(StructType, Array[Any])])] = None
  private def answerFor(agg: Aggregation): Option[(StructType, Array[Any])] =
    aggCache match {
      case Some((a, r)) if a eq agg => r
      case _ =>
        val r = aggAnswer(agg)
        aggCache = Some((agg, r))
        r
    }

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    pushed = filters
    filters // everything stays a post-scan filter: pruning is additive
  }

  override def pushedFilters(): Array[Predicate] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // only COMPLETE pushdown is ever claimed: a partial answer would make
  // Spark re-aggregate metadata rows as if they were data rows
  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    pushed.isEmpty && answerFor(aggregation).isDefined

  override def pushAggregation(aggregation: Aggregation): Boolean = {
    if (pushed.nonEmpty) return false
    answerFor(aggregation) match {
      case Some(a) => answered = Some(a); true
      case None    => false
    }
  }

  override def build(): Scan = answered match {
    case Some((aggSchema, values)) =>
      LakePruningScanBuilder.lastMetaAgg.set(aggSchema.fieldNames.toSeq)
      new LocalScan {
        override def rows(): Array[InternalRow] =
          Array(new GenericInternalRow(values))
        override def readSchema(): StructType = aggSchema
        override def description(): String =
          s"GraftLakeMetaAgg($identName: ${aggSchema.fieldNames.mkString(", ")})"
      }
    case None =>
      val translated = pushed.flatMap(e =>
        DataSourceStrategy.translateFilter(e, supportNestedPredicatePushdown = true))
      val kept = pruner(translated)
      LakePruningScanBuilder.lastKept.set(kept)
      val inner = ParquetTable(identName, spark,
        options, kept.map(d => s"$dataRoot/$d"), Some(schema), classOf[ParquetFileFormat])
        .newScanBuilder(options)
      inner.pushFilters(pushed): Unit
      inner.pruneColumns(required)
      val scan = inner.build()
      // exact stats only when every kept dir is accounted; a partial sum
      // would understate the table and could mis-broadcast a huge side
      if (kept.forall(rowMeta.contains))
        new LakePruningScanBuilder.ManifestStatsScan(scan,
          kept.map(rowMeta(_)._1).sum, kept.map(rowMeta(_)._2).sum)
      else scan
  }
}

object LakePruningScanBuilder {
  /** Observability hooks (specs assert pruning/meta-agg fired; harmless in prod). */
  val lastKept = new ThreadLocal[Seq[String]]
  val lastMetaAgg = new ThreadLocal[Seq[String]]

  /** The delegated parquet scan with manifest-exact statistics: byte and
    * row totals come from `#rows` lines instead of a file listing, and
    * the row count is EXACT — join planning upgrades from size guesses
    * to true cardinalities. Everything else delegates untouched (the
    * inner scan still plans its own partitions, columnar mode, and
    * runtime metrics).
    */
  final class ManifestStatsScan(val inner: Scan, rows: Long, bytes: Long)
      extends Scan with SupportsReportStatistics
      with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering {
    override def readSchema(): StructType = inner.readSchema()
    override def toBatch: org.apache.spark.sql.connector.read.Batch = inner.toBatch
    override def description(): String = inner.description()
    override def columnarSupportMode(): Scan.ColumnarSupportMode =
      inner.columnarSupportMode()
    override def supportedCustomMetrics(): Array[org.apache.spark.sql.connector.metric.CustomMetric] =
      inner.supportedCustomMetrics()
    override def reportDriverMetrics(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
      inner.reportDriverMetrics()
    override def estimateStatistics(): Statistics = new Statistics {
      override def sizeInBytes(): OptionalLong = OptionalLong.of(bytes)
      override def numRows(): OptionalLong = OptionalLong.of(rows)
    }
    // runtime filtering (dynamic partition pruning) must survive the
    // wrap: forward to the inner scan when it participates; an empty
    // attribute list otherwise, which Spark reads as "nothing to prune"
    // — never a silent capability downgrade of the delegate
    override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
      inner match {
        case f: org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering =>
          f.filterAttributes()
        case _ => Array.empty
      }
    override def filter(predicates: Array[Predicate]): Unit = inner match {
      case f: org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering =>
        f.filter(predicates)
      case _ => ()
    }
    override def equals(other: Any): Boolean = other match {
      case s: ManifestStatsScan => inner == s.inner
      case _                    => false
    }
    override def hashCode(): Int = inner.hashCode()
  }
}
