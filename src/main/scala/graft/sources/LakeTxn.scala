package graft.sources

import org.apache.spark.sql.SparkSession

/** MULTI-TABLE atomic commit for [[VersionedLake]] tables: a tiny
  * versioned log of `(member-table name -> version)` pairs, published
  * with the same create-exclusive claim a lake manifest uses.
  *
  * The problem it closes: a logical artifact spanning several lake
  * tables — an ANN index is centroids + (codebooks +) assignments
  * ([[graft.operators.IvfIndex]]), a materialized view is state + high
  * watermark — publishes each member with an individually-atomic commit,
  * but a crash BETWEEN member commits leaves the set torn: new centroids
  * with old assignments is a half-built index that answers wrong.
  *
  * Protocol (the two-layer shape every production lake uses — Delta's
  * commit file over data files, an Iceberg catalog pointer over snapshot
  * metadata — lifted one level, to a record over table versions):
  *
  *   1. Commit each member table normally. Member versions are durable,
  *      immutable, time-travelable — and NOT yet "the artifact".
  *   2. Publish ONE txn record naming the exact member versions that
  *      belong together. The record file appears atomically-complete or
  *      not at all ([[VersionedLake.createExclusive]]), and concurrent
  *      publishers race for the version number exactly like lake
  *      committers.
  *
  * Readers resolve member versions through the LATEST record and
  * `readVersion` each member at its pinned version: a crash anywhere
  * before step 2 leaves them on the previous record — a consistent set —
  * and the orphaned member versions are just retained history (reusable
  * by the retried writer, reclaimable by vacuum). Records are immutable,
  * so a reader that resolved a record mid-query keeps a consistent view
  * for the query's lifetime regardless of concurrent publishes.
  */
object LakeTxn {

  private def root(txnDir: String) = s"$txnDir/txn"

  /** Publish the set atomically as the next txn version. Member names
    * must not contain tab/newline; versions are the member tables'
    * committed versions (the caller just committed them).
    */
  def publish(spark: SparkSession, txnDir: String, tables: Map[String, Long]): Long = {
    require(tables.nonEmpty, "a txn record needs at least one member table")
    tables.keys.foreach(n =>
      require(n.forall(c => c != '\t' && c != '\n' && c != '\r'),
        s"member name must not contain tab/newline: $n"))
    val body = tables.toSeq.sorted.map { case (n, v) => s"$n\t$v" }.mkString("\n")
    VersionedLake.retryOnConflict() {
      val next = currentVersion(spark, txnDir).getOrElse(-1L) + 1
      VersionedLake.createExclusive(spark, root(txnDir), s"v=$next.txt", body)
      next
    }
  }

  /** Latest published txn version; None when no record exists. */
  def currentVersion(spark: SparkSession, txnDir: String): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(root(txnDir))
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) None
    else f.listStatus(p)
      .flatMap(s => s.getPath.getName.stripPrefix("v=").stripSuffix(".txt").toLongOption)
      .maxOption
  }

  /** The member versions a txn record pins. */
  def tables(spark: SparkSession, txnDir: String, version: Long): Map[String, Long] = {
    val p = new org.apache.hadoop.fs.Path(root(txnDir), s"v=$version.txt")
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = f.open(p)
    val content =
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val tmp = new Array[Byte](4096)
        var n = in.read(tmp)
        while (n > 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
        new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
      } finally in.close()
    content.linesIterator.map(_.trim).filter(_.nonEmpty).flatMap { line =>
      val tab = line.indexOf('\t')
      if (tab < 0) None
      else line.substring(tab + 1).toLongOption.map(line.substring(0, tab) -> _)
    }.toMap
  }

  /** The latest consistent member-version set, if any txn has published. */
  def current(spark: SparkSession, txnDir: String): Option[Map[String, Long]] =
    currentVersion(spark, txnDir).map(v => tables(spark, txnDir, v))

  /** Publish `tables` only when it differs from the latest record —
    * the idempotent form replayed maintenance paths use (a crashed
    * writer's retry must converge on one record, not append duplicates).
    */
  def publishIfChanged(
      spark: SparkSession,
      txnDir: String,
      tables: Map[String, Long]): Option[Long] =
    if (current(spark, txnDir).contains(tables)) None
    else Some(publish(spark, txnDir, tables))
}
