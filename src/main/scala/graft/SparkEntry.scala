package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are assembled from per-category registries; each QueryDef carries
  * its Spark plan, its DuckDB oracle (when SQL-expressible) and the
  * SURVEY.md §2 operator ids it covers (see COVERAGE.md).
  */
object SparkEntry {

  def all: Seq[QueryDef] =
    queries_relational ++ queries_ext

  private def queries_relational: Seq[QueryDef] =
    graft.queries.Relational.defs ++ graft.queries.Relational2.defs ++
      graft.queries.Relational3.defs ++ graft.queries.Relational4.defs ++
      graft.queries.Relational5.defs ++ graft.queries.Analytics.defs ++
      graft.queries.Tpch.defs
  private def queries_ext: Seq[QueryDef] =
    graft.queries.Text.defs ++ graft.queries.Dedup.defs ++
      graft.queries.Similarity.defs ++ graft.queries.MultimodalQ.defs ++
      graft.queries.Training.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.flatMap(d => d.oracle.orElse(d.oracleDyn.flatMap(_())).map(d.name -> _)).toMap
}
