package graft.sinks

import java.sql.Connection

/** S6: the relational-constraint catalog — primary/foreign keys reflected
  * once via JDBC `DatabaseMetaData` and cached
  * (`/root/reference/parser/server.py:12-38`), plus the dependency-first
  * load order.
  *
  * The reference discovers FK order by ad-hoc recursion with a `_processed`
  * list that is never populated (`parser/xml.py:596-604`) — termination by
  * luck. Here: explicit Kahn topological sort with cycle detection.
  */
final case class JdbcConstraints(
    primaryKeys: Map[String, Seq[String]],
    // table -> referenced tables
    foreignKeys: Map[String, Set[String]]) {

  /** Dependency-first order over `tables` (referenced tables load before
    * referencing ones). Edges to tables outside the set are ignored, like
    * the reference's `add_table in self._data_map` check. Throws on cycles.
    */
  def topoOrder(tables: Seq[String]): Seq[String] = {
    val inSet = tables.toSet
    val deps: Map[String, Set[String]] =
      tables.map(t => t -> (foreignKeys.getOrElse(t, Set.empty) & inSet - t)).toMap
    val order = scala.collection.mutable.ArrayBuffer[String]()
    val remaining = scala.collection.mutable.Set(tables: _*)
    var progress = true
    while (remaining.nonEmpty && progress) {
      val ready = tables.filter(t =>
        remaining(t) && (deps(t) & remaining.toSet).isEmpty)
      progress = ready.nonEmpty
      ready.foreach { t => order += t; remaining -= t }
    }
    require(remaining.isEmpty, s"FK cycle among tables: ${remaining.mkString(", ")}")
    order.toSeq
  }
}

object JdbcConstraints {

  /** Reflect PKs and FK edges for every table in `schema` (null = default). */
  def reflect(conn: Connection, schema: String = null): JdbcConstraints = {
    val md = conn.getMetaData
    val tables = scala.collection.mutable.ArrayBuffer[String]()
    val rs = md.getTables(null, schema, "%", Array("TABLE"))
    while (rs.next()) tables += rs.getString("TABLE_NAME")
    rs.close()

    val pks = tables.map { t =>
      val r = md.getPrimaryKeys(null, schema, t)
      val cols = scala.collection.mutable.ArrayBuffer[(Short, String)]()
      while (r.next()) cols += ((r.getShort("KEY_SEQ"), r.getString("COLUMN_NAME")))
      r.close()
      t -> cols.sortBy(_._1).map(_._2).toSeq
    }.toMap

    val fks = tables.map { t =>
      val r = md.getImportedKeys(null, schema, t)
      val refs = scala.collection.mutable.Set[String]()
      while (r.next()) refs += r.getString("PKTABLE_NAME")
      r.close()
      t -> refs.toSet
    }.toMap

    JdbcConstraints(pks, fks)
  }
}
