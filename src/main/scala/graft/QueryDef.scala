package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator demonstration: a Spark query over the driver's
  * test tables plus (when SQL-expressible) an equivalent DuckDB oracle.
  *
  * `name` keys both `SparkEntry.queries` and `SparkEntry.oracleSql`; the
  * driver compares column-sorted value hashes, so the Spark plan and the
  * oracle must agree on column NAMES as well as values. All doubles that
  * pass through an aggregate are rounded in BOTH dialects to erase
  * summation-order noise.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    /** SURVEY.md §2 operator ids this query exercises (for COVERAGE.md). */
    covers: Seq[String] = Nil,
    /** Late-bound oracle for queries whose SQL embeds DATA-derived
      * literals (e.g. k-means centroids trained inside `fn`): evaluated
      * when [[SparkEntry.oracleSql]] is rendered — Verify dumps
      * oracle_sql.json AFTER running every query, so by then `fn` has
      * frozen its model and the generated SQL replays it exactly.
      * The inner Option is None until the model exists (falls back to a
      * rows-only check for that run).
      */
    oracleDyn: Option[() => Option[String]] = None)

object QueryDef {
  /** Convenience table reader used by every query. Delegates to
    * [[graft.engine.Session.table]] so `events.ts` normalization (epoch-nano
    * longs regardless of the fixture's parquet timestamp flavor) applies on
    * every read path.
    */
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    graft.engine.Session.table(spark, sfDir, name)
}
