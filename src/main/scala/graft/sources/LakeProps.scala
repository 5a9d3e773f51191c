package graft.sources

import org.apache.spark.sql.SparkSession

/** Small free-form table properties for [[VersionedLake]] tables — the
  * `delta.enableChangeDataFeed`-shaped switchboard. One JSON object per
  * generation file under `props/` beside the manifest: table metadata,
  * not per-version state — a property governs commits from the moment
  * it is set.
  *
  * Concurrency: property updates are compare-and-swap, not
  * read-modify-replace. Each mutation re-reads the current generation,
  * applies its change, and publishes `props/g=<n+1>.txt` through the
  * commit store's [[VersionedLake.CommitStore.createExclusive]] — the
  * same OCC fence manifests use — so two concurrent updates (e.g.
  * `table.parts` at CREATE racing a `cdc.*` ALTER from another driver)
  * serialize: the loser's exclusive create conflicts, it re-reads the
  * winner's map and re-applies on top. A plain atomic-replace of one
  * shared file (the previous design) silently lost one of the two.
  * Legacy single-file `props.txt` tables read as generation 0 and
  * upgrade on their first mutation.
  *
  * The one property the engine consults today:
  *
  *   - `cdc.artifacts` (default `"true"`): whether copy-on-write
  *     commits publish their row-delta change artifact. Delta's CDF is
  *     opt-IN per table; the lake defaults ON because four built-in
  *     consumers (SQL `t$changes`, streaming, index sync, view
  *     maintenance) read the feed — but a table with no feed consumer
  *     pays an extra matched-rows read and a parquet write per CoW
  *     commit for nothing. Setting `'false'` skips the artifact;
  *     the change feed then refuses those windows, like any
  *     artifact-less rewrite. Reaches SQL DML too (the commands ride
  *     the same library calls), which has no per-call parameter.
  */
object LakeProps {

  private val LegacyFile = "props.txt"
  private val GenDir = "props"

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  /** (generation, map) of the newest published generation; generation 0
    * covers both "no properties ever" (empty map) and the legacy
    * single-file layout. Zero-length generation files are skipped, the
    * [[VersionedLake.currentVersion]] open-fence contract.
    */
  private def current(spark: SparkSession, tableDir: String): (Long, Map[String, String]) = {
    val f = fs(spark, tableDir)
    val root = new org.apache.hadoop.fs.Path(tableDir, GenDir)
    val newest =
      if (!f.exists(root)) None
      else f.listStatus(root)
        .filter(_.getLen > 0)
        .flatMap(s =>
          s.getPath.getName.stripPrefix("g=").stripSuffix(".txt").toLongOption
            .map(_ -> s.getPath))
        .maxByOption(_._1)
    newest match {
      case Some((g, p)) => (g, parse(readText(spark, tableDir, p)))
      case None =>
        val legacy = new org.apache.hadoop.fs.Path(tableDir, LegacyFile)
        if (f.exists(legacy)) (0L, parse(readText(spark, tableDir, legacy)))
        else (0L, Map.empty)
    }
  }

  private def readText(
      spark: SparkSession,
      tableDir: String,
      p: org.apache.hadoop.fs.Path): String = {
    val in = fs(spark, tableDir).open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  private def parse(text: String): Map[String, String] = {
    import org.json4s.JsonAST._
    scala.util.Try(org.json4s.jackson.JsonMethods.parse(text)).toOption match {
      case Some(JObject(fields)) => fields.collect { case (k, JString(v)) => k -> v }.toMap
      case _                     => Map.empty
    }
  }

  private def render(props: Map[String, String]): String = {
    import org.json4s.JsonAST._
    org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(
        JObject(props.toList.sortBy(_._1).map { case (k, v) => k -> (JString(v): JValue) })))
  }

  def get(spark: SparkSession, tableDir: String): Map[String, String] =
    current(spark, tableDir)._2

  def set(spark: SparkSession, tableDir: String, key: String, value: String): Unit =
    mutate(spark, tableDir)(_ + (key -> value))

  def unset(spark: SparkSession, tableDir: String, key: String): Unit =
    mutate(spark, tableDir)(_ - key)

  /** Whether CoW commits of this table publish change artifacts. */
  def cdcArtifacts(spark: SparkSession, tableDir: String): Boolean =
    !get(spark, tableDir).get("cdc.artifacts").contains("false")

  /** The CAS loop: re-read, re-apply, publish the next generation
    * exclusively; a conflict means a concurrent update won the slot, so
    * re-base on its map and retry. Same bounded-retry discipline as
    * [[VersionedLake.retryOnConflict]]. A crashed committer's
    * zero-length generation file heals like an orphan manifest: stale
    * beyond the grace window, it is deleted and the slot re-claimed.
    */
  private def mutate(
      spark: SparkSession,
      tableDir: String)(f: Map[String, String] => Map[String, String]): Unit =
    VersionedLake.retryOnConflict() {
      val (gen, cur) = current(spark, tableDir)
      val next = gen + 1
      val name = s"g=$next.txt"
      try VersionedLake.createExclusive(spark, s"$tableDir/$GenDir", name, render(f(cur)))
      catch {
        case e: VersionedLake.CommitConflictException =>
          val mp = new org.apache.hadoop.fs.Path(s"$tableDir/$GenDir", name)
          val healed = scala.util.Try {
            val st = fs(spark, tableDir).getFileStatus(mp)
            st.getLen == 0 &&
              System.currentTimeMillis() - st.getModificationTime >
                VersionedLake.OrphanManifestGraceMs &&
              fs(spark, tableDir).delete(mp, false)
          }.getOrElse(false)
          if (!healed) throw e
          VersionedLake.createExclusive(spark, s"$tableDir/$GenDir", name, render(f(cur)))
      }
      // retire old generations best-effort, keeping a few so an in-flight
      // reader that already listed an older max can still open its file
      scala.util.Try {
        val f2 = fs(spark, tableDir)
        val root = new org.apache.hadoop.fs.Path(tableDir, GenDir)
        f2.listStatus(root)
          .flatMap(s =>
            s.getPath.getName.stripPrefix("g=").stripSuffix(".txt").toLongOption
              .map(_ -> s.getPath))
          .filter(_._1 < next - 3)
          .foreach { case (_, p) => f2.delete(p, false) }
      }: Unit
    }
}
