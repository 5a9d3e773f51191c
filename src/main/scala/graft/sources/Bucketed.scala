package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed table layout: pre-shuffle a fact table ONCE at write time so
  * every later equi-join / aggregation on the bucket key runs with NO
  * exchange at all.
  *
  * This is the Spark-native answer to the reference's single-node luxury of
  * never shuffling (everything is one pandas process —
  * /root/reference/parser/xml.py:214-232 chains its joins in memory): at
  * 100 TB the
  * dominant cost of a fact⋈fact join is the two full-table shuffles, and
  * bucketing amortizes them into the initial write. Both sides bucketed by
  * the join key into the same bucket count → Catalyst plans a sort-merge
  * join whose children are bucket-aligned scans (outputPartitioning =
  * HashPartitioning(key, n) straight off the files), no
  * ShuffleExchange on either side. The same layout serves groupBy(key)
  * aggregations shuffle-free.
  *
  * Mechanics that matter for the no-shuffle plan:
  *   - both tables must agree on bucket COUNT and key;
  *   - we `repartition(buckets, key)` before the write so each write task
  *     owns exactly one bucket (repartition's pmod(murmur3) IS the bucket
  *     function) — one file per bucket; Spark ≥3.0 still plans a LOCAL
  *     re-sort below the merge join by default (it no longer trusts
  *     in-file order unless
  *     `spark.sql.legacy.bucketedTableScan.outputOrdering=true`, which
  *     the one-file-per-bucket layout makes safe to enable) — local sort
  *     is cheap; the eliminated network shuffle is what matters;
  *   - bucketed scans disable file splitting, so a bucket is a partition:
  *     at cluster scale pick `buckets` ≈ the parallelism you want
  *     (hundreds+); locally the specs use small counts.
  */
object Bucketed {

  /** DROP + rewrite `table` as a parquet managed table bucketed and
    * in-bucket sorted by `key`. Idempotent per call — reruns in the same
    * warehouse replace the previous layout.
    */
  def write(df: DataFrame, table: String, buckets: Int, key: String): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // the in-memory catalog dies with the JVM but the warehouse directory
    // survives it; an orphaned location fails CREATE TABLE AS, so clear it
    val loc = spark.sessionState.catalog
      .defaultTablePath(org.apache.spark.sql.catalyst.TableIdentifier(table))
    val p = new org.apache.hadoop.fs.Path(loc)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    df.repartition(buckets, col(key))
      .write
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** Write only if the table doesn't already exist in the CALLER's
    * session catalog (the common per-session cache for repeated query
    * runs). The caller's session is threaded explicitly — with multiple
    * SparkSessions alive, `SparkSession.active` could consult one
    * session's catalog while the caller reads through another's, skipping
    * a needed write or failing the read.
    */
  def ensure(spark: SparkSession, df: => DataFrame, table: String, buckets: Int, key: String): Unit =
    if (!spark.catalog.tableExists(table)) write(df, table, buckets, key)
}
