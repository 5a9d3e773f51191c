package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownRequiredColumns}
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
  */
final class LakePruningScanBuilder(
    spark: SparkSession,
    identName: String,
    dataRoot: String,
    schema: StructType,
    options: CaseInsensitiveStringMap,
    pruner: Seq[Filter] => Seq[String]) extends ScanBuilder
    with SupportsPushDownCatalystFilters with SupportsPushDownRequiredColumns {

  private var pushed: Seq[Expression] = Nil
  private var required: StructType = schema

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    pushed = filters
    filters // everything stays a post-scan filter: pruning is additive
  }

  override def pushedFilters(): Array[Predicate] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    val translated = pushed.flatMap(e =>
      DataSourceStrategy.translateFilter(e, supportNestedPredicatePushdown = true))
    val kept = pruner(translated)
    LakePruningScanBuilder.lastKept.set(kept)
    val inner = ParquetTable(identName, spark,
      options, kept.map(d => s"$dataRoot/$d"), Some(schema), classOf[ParquetFileFormat])
      .newScanBuilder(options)
    inner.pushFilters(pushed): Unit
    inner.pruneColumns(required)
    inner.build()
  }
}

object LakePruningScanBuilder {
  /** Observability hook (specs assert pruning fired; harmless in prod). */
  val lastKept = new ThreadLocal[Seq[String]]
}
