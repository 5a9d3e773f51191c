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
  * Concurrency: the whole ref map updates through the shared
  * exclusive-generation store ([[GenCas]]) — two concurrent ref updates
  * serialize, the loser re-bases — and retiring a branch is
  * compare-and-swap at the VALUE level too ([[dropIf]]), which is what
  * lets a WAP publish leave a ref alone when someone re-pointed the
  * branch under the audit.
  */
object LakeRefs {

  private val GenDir = "refs"

  final case class Ref(version: Long, kind: String)

  private def parse(text: String): Map[String, Ref] = {
    import org.json4s.JsonAST._
    scala.util.Try(org.json4s.jackson.JsonMethods.parse(text)).toOption match {
      case Some(JObject(fields)) =>
        fields.collect {
          case (name, JObject(sub)) =>
            val sm = sub.toMap
            (sm.get("v"), sm.get("kind")) match {
              case (Some(JInt(v)), Some(JString(k))) => Some(name -> Ref(v.toLong, k))
              case _ => None
            }
        }.flatten.toMap
      case _ => Map.empty
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
    GenCas.read(spark, s"$tableDir/$GenDir")._2.map(parse).getOrElse(Map.empty)

  def resolve(spark: SparkSession, tableDir: String, name: String): Option[Long] =
    list(spark, tableDir).get(name).map(_.version)

  /** Immutable named version. Refuses to re-point an existing name
    * (an identical re-create is a no-op — the idempotence [[GenCas]]'s
    * ABA guard requires of mutation functions).
    */
  def tag(spark: SparkSession, tableDir: String, name: String, version: Long): Unit =
    create(spark, tableDir, name, Ref(version, "tag"))

  /** Movable named pointer (the WAP staging handle). */
  def branch(spark: SparkSession, tableDir: String, name: String, version: Long): Unit =
    create(spark, tableDir, name, Ref(version, "branch"))

  private def create(
      spark: SparkSession,
      tableDir: String,
      name: String,
      ref: Ref): Unit =
    mutate(spark, tableDir) { m =>
      m.get(name) match {
        case Some(existing) if existing == ref => m // idempotent re-apply
        case Some(_) =>
          throw new IllegalArgumentException(
            s"ref '$name' already exists on $tableDir")
        case None => m + (name -> ref)
      }
    }

  def drop(spark: SparkSession, tableDir: String, name: String): Unit =
    mutate(spark, tableDir)(_ - name)

  /** Move a BRANCH from `expect` to `to` (value-level CAS, like
    * [[dropIf]]): false and no change when the ref moved, vanished, or
    * is a tag — a multi-commit WAP advancing its own chain tip must
    * never clobber a name someone else re-pointed under it.
    */
  def repointIf(
      spark: SparkSession,
      tableDir: String,
      name: String,
      expect: Long,
      to: Long): Boolean = {
    var ok = false
    mutate(spark, tableDir) { m =>
      m.get(name) match {
        case Some(Ref(`expect`, "branch")) => ok = true; m + (name -> Ref(to, "branch"))
        case Some(Ref(`to`, "branch"))     => ok = true; m // idempotent re-apply
        case _                             => ok = false; m
      }
    }
    ok
  }

  /** Value-level CAS retire: drop `name` only while it still points at
    * `expect`; false (and no change) when it moved or vanished — a
    * re-pointed branch belongs to whoever re-pointed it.
    */
  def dropIf(
      spark: SparkSession,
      tableDir: String,
      name: String,
      expect: Long): Boolean = {
    var ok = false
    mutate(spark, tableDir) { m =>
      // re-evaluated per CAS attempt: only the LAST application's
      // outcome may answer (a sticky flag would report "no change"
      // after a retried attempt actually dropped the ref)
      m.get(name) match {
        case Some(r) if r.version == expect => ok = true; m - name
        case _ => ok = false; m
      }
    }
    ok
  }

  private def mutate(
      spark: SparkSession,
      tableDir: String)(f: Map[String, Ref] => Map[String, Ref]): Unit =
    GenCas.mutate(spark, s"$tableDir/$GenDir") { cur =>
      render(f(cur.map(parse).getOrElse(Map.empty)))
    }
}
