package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned lake table with ATOMIC publishes — the minimal transaction
  * log that fixes bare-parquet's two 100 TB problems:
  *
  *   1. '''No atomic multi-file commit.''' A writer that dies mid-write
  *      leaves a directory readers half-see. Here every commit writes its
  *      files under a fresh `v=N` directory and then publishes by
  *      replacing ONE pointer file (`_latest`) — written to a temp name
  *      and renamed, the single-object atomicity every store provides.
  *      Orphan files from a crashed writer live in an unpublished
  *      version directory readers never resolve.
  *   2. '''No snapshot isolation for rewrites.''' [[Lake.upsertPartitioned]]
  *      must materialize its merged slice (localCheckpoint) because the
  *      write overwrites directories its own plan reads. A versioned
  *      upsert writes the NEW version while the old one stays on disk —
  *      the plan streams straight from read to write, no materialization,
  *      and in-flight readers of v=N are undisturbed by the v=N+1 commit.
  *
  * Layout: `table/v=N/...parquet` (optionally partitioned inside) +
  * `table/_latest` holding N. Old versions remain until [[vacuum]] —
  * which is exactly time travel until then ([[readVersion]]).
  */
object VersionedLake {

  private val Pointer = "_latest"

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Currently published version; None for an empty/uninitialized table. */
  def currentVersion(spark: SparkSession, tableDir: String): Option[Long] = {
    val f = fs(spark, tableDir)
    val p = new org.apache.hadoop.fs.Path(tableDir, Pointer)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val tmp = new Array[Byte](64)
        var n = in.read(tmp)
        while (n > 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
        Some(new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8).trim.toLong)
      } finally in.close()
    }
  }

  /** Highest version directory present, published or not — commit
    * allocates ABOVE this so a crashed writer's orphan directory can
    * never collide with the next commit's target.
    */
  private def maxVersionDir(spark: SparkSession, tableDir: String): Option[Long] = {
    val f = fs(spark, tableDir)
    val root = new org.apache.hadoop.fs.Path(tableDir)
    if (!f.exists(root)) None
    else f.listStatus(root).toSeq
      .filter(_.isDirectory)
      .flatMap(s => s.getPath.getName.stripPrefix("v=").toLongOption)
      .maxOption
  }

  /** Write `df` as the next version and atomically publish it. Returns
    * the committed version number. Data lands fully BEFORE the pointer
    * moves; a crash at any earlier point leaves the table at the prior
    * version with only an unpublished directory as garbage.
    */
  def commit(
      df: DataFrame,
      tableDir: String,
      parts: Seq[String] = Nil,
      maxRecordsPerFile: Long = 8L * 1000 * 1000): Long = {
    val spark = df.sparkSession
    val next = math.max(
      currentVersion(spark, tableDir).getOrElse(-1L),
      maxVersionDir(spark, tableDir).getOrElse(-1L)) + 1
    val versionDir = s"$tableDir/v=$next"
    val writer0 = (if (parts.nonEmpty) df.repartition(parts.map(col): _*) else df)
      .write.mode("error").option("maxRecordsPerFile", maxRecordsPerFile)
    val writer = if (parts.nonEmpty) writer0.partitionBy(parts: _*) else writer0
    writer.parquet(versionDir)
    publish(spark, tableDir, next)
    next
  }

  /** Atomically move the pointer: write `_latest.tmp`, rename over
    * `_latest` (delete-then-rename where the FS lacks overwriting rename
    * — the pointer is one object either way, never a half state).
    */
  private def publish(spark: SparkSession, tableDir: String, version: Long): Unit = {
    val f = fs(spark, tableDir)
    val tmp = new org.apache.hadoop.fs.Path(tableDir, s"$Pointer.tmp")
    val dst = new org.apache.hadoop.fs.Path(tableDir, Pointer)
    val out = f.create(tmp, true)
    try out.write(version.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (f.exists(dst)) f.delete(dst, false)
    require(f.rename(tmp, dst), s"pointer publish failed for $tableDir v=$version")
  }

  /** Read the published snapshot (the version `_latest` points at —
    * unpublished or in-flight version directories are invisible).
    */
  def read(spark: SparkSession, tableDir: String): DataFrame =
    readVersion(spark, tableDir,
      currentVersion(spark, tableDir)
        .getOrElse(throw new IllegalStateException(s"no published version in $tableDir")))

  /** Time travel: read a specific retained version. */
  def readVersion(spark: SparkSession, tableDir: String, version: Long): DataFrame =
    spark.read.parquet(s"$tableDir/v=$version")

  /** Keyed upsert as a new version: same MERGE semantics as
    * [[Lake.upsertPartitioned]] (updates replace same-key rows, others
    * append) but with NO materialization barrier — the merged plan
    * streams from the OLD version's files into the NEW version's
    * directory, because nothing is overwritten. Readers of the old
    * version are undisturbed; the same immutable-partition-key contract
    * applies when `parts` is set.
    */
  def upsert(
      spark: SparkSession,
      tableDir: String,
      updates: DataFrame,
      keys: Seq[String],
      parts: Seq[String] = Nil,
      maxRecordsPerFile: Long = 8L * 1000 * 1000): Long = {
    val existing = read(spark, tableDir)
    val survivors = existing.join(updates.select(keys.map(col): _*), keys, "left_anti")
    commit(survivors.unionByName(updates), tableDir, parts, maxRecordsPerFile)
  }

  /** Drop all versions below the published one (ends their time-travel
    * window; never touches the published version or the pointer).
    */
  def vacuum(spark: SparkSession, tableDir: String): Unit = {
    val f = fs(spark, tableDir)
    currentVersion(spark, tableDir).foreach { cur =>
      val st = f.listStatus(new org.apache.hadoop.fs.Path(tableDir))
      st.filter(_.isDirectory)
        .map(_.getPath)
        .filter { p =>
          p.getName.startsWith("v=") &&
            p.getName.stripPrefix("v=").toLongOption.exists(_ < cur)
        }
        .foreach(p => f.delete(p, true))
    }
  }
}
