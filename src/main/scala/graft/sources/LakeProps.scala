package graft.sources

import org.apache.spark.sql.SparkSession

/** Small free-form table properties for [[VersionedLake]] tables — the
  * `delta.enableChangeDataFeed`-shaped switchboard. One JSON object per
  * generation file under `props/` beside the manifest: table metadata,
  * not per-version state — a property governs commits from the moment
  * it is set.
  *
  * Concurrency: property updates are compare-and-swap through the
  * shared exclusive-generation store ([[GenCas]] — the same OCC fence
  * manifests use), so two concurrent updates (e.g. `table.parts` at
  * CREATE racing a `cdc.*` ALTER from another driver) serialize: the
  * loser re-reads the winner's map and re-applies on top. A plain
  * atomic-replace of one shared file (the previous design) silently
  * lost one of the two. Legacy single-file `props.txt` tables read as
  * generation 0 and upgrade on their first mutation.
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

  private def legacy(spark: SparkSession, tableDir: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(tableDir, LegacyFile)
    val f = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      Some(try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close())
    }
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
    GenCas.read(spark, s"$tableDir/$GenDir")._2
      .orElse(legacy(spark, tableDir))
      .map(parse).getOrElse(Map.empty)

  def set(spark: SparkSession, tableDir: String, key: String, value: String): Unit =
    mutate(spark, tableDir)(_ + (key -> value))

  def unset(spark: SparkSession, tableDir: String, key: String): Unit =
    mutate(spark, tableDir)(_ - key)

  /** Whether CoW commits of this table publish change artifacts. */
  def cdcArtifacts(spark: SparkSession, tableDir: String): Boolean =
    !get(spark, tableDir).get("cdc.artifacts").contains("false")

  /** Whether SQL predicate DELETEs take the merge-on-read position-delete
    * path (`TBLPROPERTIES('delete.mode'='merge-on-read')`) instead of the
    * default minimal copy-on-write — the Iceberg `write.delete.mode`
    * knob. Reads keep answering through the read-through splice; the
    * debt folds at the next optimize/materializeDeletes.
    */
  def deleteModeMor(spark: SparkSession, tableDir: String): Boolean =
    get(spark, tableDir).get("delete.mode").contains("merge-on-read")

  /** [[deleteModeMor]]'s UPDATE twin: SQL predicate UPDATEs take the
    * position-delete + appended-rows path instead of the CoW rewrite.
    */
  def updateModeMor(spark: SparkSession, tableDir: String): Boolean =
    get(spark, tableDir).get("update.mode").contains("merge-on-read")

  private def mutate(
      spark: SparkSession,
      tableDir: String)(f: Map[String, String] => Map[String, String]): Unit =
    GenCas.mutate(spark, s"$tableDir/$GenDir") { cur =>
      render(f(cur.orElse(legacy(spark, tableDir)).map(parse).getOrElse(Map.empty)))
    }
}
