package graft.sources

import org.apache.spark.sql.SparkSession

/** NAMED REFS on the commit log: human-named pointers at versions —
  * `tag` for immutable release/audit marks (`VERSION AS OF 'name'` in
  * SQL, [[VersionedLake.vacuum]] keeps a tagged version's manifest and
  * directories alive past numeric retention), `branch` for the movable
  * pointers the write-audit-publish flow uses ([[LakeWap]]). The
  * Iceberg ref model on this table's linear log: a ref is metadata (one
  * CAS'd map file under `refs/`), so creating one from ANY retained
  * version is free at every scale.
  *
  * Concurrency: the whole ref map updates through the same
  * exclusive-generation CAS as [[LakeProps]] — two concurrent ref
  * updates serialize, the loser re-bases — and moves are
  * compare-and-swap at the VALUE level too ([[moveIf]]), which is what
  * lets a WAP publish refuse when someone re-pointed the branch under
  * the audit.
  */
object LakeRefs {

  private val GenDir = "refs"

  final case class Ref(version: Long, kind: String)

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  private def current(spark: SparkSession, tableDir: String): (Long, Map[String, Ref]) = {
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
      case None => (0L, Map.empty)
      case Some((g, p)) =>
        val in = f.open(p)
        val text =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
        import org.json4s.JsonAST._
        val m = scala.util.Try(org.json4s.jackson.JsonMethods.parse(text)).toOption match {
          case Some(JObject(fields)) =>
            fields.collect {
              case (name, JObject(sub)) =>
                val sm = sub.toMap
                (sm.get("v"), sm.get("kind")) match {
                  case (Some(JInt(v)), Some(JString(k))) => Some(name -> Ref(v.toLong, k))
                  case _ => None
                }
            }.flatten.toMap
          case _ => Map.empty[String, Ref]
        }
        (g, m)
    }
  }

  private def render(refs: Map[String, Ref]): String = {
    import org.json4s.JsonAST._
    org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(
        JObject(refs.toList.sortBy(_._1).map { case (n, r) =>
          n -> (JObject(List(
            "v" -> (JInt(r.version): JValue),
            "kind" -> (JString(r.kind): JValue))): JValue)
        })))
  }

  def list(spark: SparkSession, tableDir: String): Map[String, Ref] =
    current(spark, tableDir)._2

  def resolve(spark: SparkSession, tableDir: String, name: String): Option[Long] =
    list(spark, tableDir).get(name).map(_.version)

  /** Immutable named version. Refuses to re-point an existing name. */
  def tag(spark: SparkSession, tableDir: String, name: String, version: Long): Unit =
    mutate(spark, tableDir) { m =>
      require(!m.contains(name), s"ref '$name' already exists on $tableDir")
      m + (name -> Ref(version, "tag"))
    }

  /** Movable named pointer (the WAP staging handle). */
  def branch(spark: SparkSession, tableDir: String, name: String, version: Long): Unit =
    mutate(spark, tableDir) { m =>
      require(!m.contains(name), s"ref '$name' already exists on $tableDir")
      m + (name -> Ref(version, "branch"))
    }

  def drop(spark: SparkSession, tableDir: String, name: String): Unit =
    mutate(spark, tableDir)(_ - name)

  /** Value-level CAS move: re-point `name` from `expect` to `to`; false
    * when the ref moved (or vanished) under the caller.
    */
  def moveIf(
      spark: SparkSession,
      tableDir: String,
      name: String,
      expect: Long,
      to: Long): Boolean = {
    var ok = true
    mutate(spark, tableDir) { m =>
      m.get(name) match {
        case Some(r) if r.version == expect => m + (name -> r.copy(version = to))
        case _ => ok = false; m
      }
    }
    ok
  }

  /** Same CAS loop as [[LakeProps]]: exclusive generation files, loser
    * re-reads and re-applies; crashed zero-length generations heal.
    */
  private def mutate(
      spark: SparkSession,
      tableDir: String)(f: Map[String, Ref] => Map[String, Ref]): Unit =
    VersionedLake.retryOnConflict() {
      val (gen, cur) = current(spark, tableDir)
      val next = gen + 1
      val name = s"g=$next.txt"
      val body = render(f(cur))
      try VersionedLake.createExclusive(spark, s"$tableDir/$GenDir", name, body)
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
          VersionedLake.createExclusive(spark, s"$tableDir/$GenDir", name, body)
      }
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
