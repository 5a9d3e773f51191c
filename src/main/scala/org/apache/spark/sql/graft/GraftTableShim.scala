package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.Table
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `private[sql]` bridge for [[graft.sources.GraftCatalog]]: builds
  * Spark's own DataSource-V2 parquet table over an explicit file-root
  * list. The catalog resolves WHICH directories a lake version comprises
  * (the manifest's job); everything below — partition discovery over the
  * hive layout, column pruning, predicate pushdown to parquet row
  * groups, vectorized decode, whole-stage codegen — is the stock
  * `ParquetTable` machinery, so a catalog read plans byte-identically to
  * `spark.read.parquet(dirs: _*)` with a user schema. Deliberately NOT a
  * reimplementation of a file scan: the lake's value-add is manifest
  * resolution + snapshot isolation, and delegation keeps every Spark
  * upgrade's scan improvements for free.
  */
object GraftTableShim {

  def parquetTable(
      spark: SparkSession,
      name: String,
      paths: Seq[String],
      schema: Option[StructType],
      options: java.util.Map[String, String]): Table =
    ParquetTable(name, spark, new CaseInsensitiveStringMap(options), paths,
      schema, classOf[ParquetFileFormat])
}
