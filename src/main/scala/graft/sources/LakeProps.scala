package graft.sources

import org.apache.spark.sql.SparkSession

/** Small free-form table properties for [[VersionedLake]] tables — the
  * `delta.enableChangeDataFeed`-shaped switchboard. One JSON object in
  * `props.txt` beside the manifest (atomic replace, like
  * [[LakeConstraints]]): table metadata, not per-version state — a
  * property governs commits from the moment it is set.
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

  private val FileName = "props.txt"

  def get(spark: SparkSession, tableDir: String): Map[String, String] = {
    val p = new org.apache.hadoop.fs.Path(tableDir, FileName)
    val f = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!f.exists(p)) Map.empty
    else {
      val in = f.open(p)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      import org.json4s.JsonAST._
      org.json4s.jackson.JsonMethods.parse(text) match {
        case JObject(fields) => fields.collect { case (k, JString(v)) => k -> v }.toMap
        case _ => Map.empty
      }
    }
  }

  def set(spark: SparkSession, tableDir: String, key: String, value: String): Unit =
    write(spark, tableDir, get(spark, tableDir) + (key -> value))

  def unset(spark: SparkSession, tableDir: String, key: String): Unit =
    write(spark, tableDir, get(spark, tableDir) - key)

  /** Whether CoW commits of this table publish change artifacts. */
  def cdcArtifacts(spark: SparkSession, tableDir: String): Boolean =
    !get(spark, tableDir).get("cdc.artifacts").contains("false")

  private def write(spark: SparkSession, tableDir: String, props: Map[String, String]): Unit = {
    import org.json4s.JsonAST._
    val json = org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(
        JObject(props.toList.sortBy(_._1).map { case (k, v) => k -> (JString(v): JValue) })))
    // same atomic-replace contract as the pointer file
    VersionedLake.commitStore.atomicWrite(spark, tableDir, FileName, json)
  }
}
