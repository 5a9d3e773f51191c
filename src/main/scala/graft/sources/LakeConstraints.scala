package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table-level CHECK constraints for [[VersionedLake]] tables — the
  * admission-gate idea of the DQ suite ([[graft.operators.Quality]])
  * promoted to a property OF the table: once declared, every ingest
  * path (append, txn append, snapshot commit, upsert, updateWhere — and
  * therefore the streaming sink and the SQL catalog's INSERTs, which
  * ride those paths) validates the incoming rows and REFUSES the commit
  * on violation, so a reader never needs to re-check what the table
  * already promises. The same contract as Delta's CHECK constraints.
  *
  * Semantics are SQL CHECK: a row violates only when the predicate
  * evaluates to FALSE — NULL (unknown) passes, matching the standard
  * and Delta. A batch that omits a constrained column under the lake's
  * union-by-name evolution reads that column as NULL and passes, for
  * the same reason old directories pass a constraint added later…
  * except they don't get the chance to be wrong: [[add]] validates the
  * CURRENT snapshot first (one full scan, at DDL time — the only
  * non-O(delta) moment in the design), so the invariant holds
  * inductively afterward at O(batch) per commit.
  *
  * Constraints live in one small `constraints.txt` beside the manifest
  * (atomic replace, JSON-per-line) — table metadata, not per-version
  * state: like Delta, a constraint governs WRITES from the moment it
  * exists; time-traveled reads of old versions are unaffected.
  * Constraint DDL is not designed for concurrent DDL racing itself; a
  * constraint added while a commit is in flight governs the next
  * commit, not the in-flight one (enforcement reads the file at commit
  * start).
  *
  * Enforcement is ONE aggregate job over the batch per commit (all
  * constraints summed in a single pass), so at 100 TB the cost tracks
  * ingest rate and constraint count, never table size.
  */
object LakeConstraints {

  private val FileName = "constraints.txt"

  /** Declared constraints, in declaration order. */
  def constraintsOf(spark: SparkSession, tableDir: String): Seq[(String, String)] = {
    val p = new org.apache.hadoop.fs.Path(tableDir, FileName)
    val f = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!f.exists(p)) Nil
    else {
      val in = f.open(p)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      text.linesIterator.map(_.trim).filter(_.nonEmpty).map { line =>
        import org.json4s.JsonAST._
        org.json4s.jackson.JsonMethods.parse(line) match {
          case JObject(fields) =>
            val m = fields.toMap
            (m.get("name"), m.get("check")) match {
              case (Some(JString(n)), Some(JString(c))) => n -> c
              case _ => throw new IllegalStateException(s"malformed constraint line: $line")
            }
          case _ => throw new IllegalStateException(s"malformed constraint line: $line")
        }
      }.toSeq
    }
  }

  /** Declare a CHECK constraint. Validates the current snapshot FIRST
    * (a table already violating the predicate refuses the DDL, like
    * Delta's ADD CONSTRAINT), then persists.
    */
  def add(spark: SparkSession, tableDir: String, name: String, check: String): Unit = {
    val existing = constraintsOf(spark, tableDir)
    require(!existing.exists(_._1 == name), s"constraint '$name' already exists on $tableDir")
    // fail fast on an unparseable predicate before scanning anything
    expr(check): Unit
    VersionedLake.currentVersion(spark, tableDir).foreach { _ =>
      enforceOn(VersionedLake.read(spark, tableDir), tableDir,
        Seq(name -> check), "ADD CONSTRAINT (existing rows)")
    }
    write(spark, tableDir, existing :+ (name -> check))
  }

  /** Verbatim constraint carry for [[VersionedLake.cloneTable]]: the
    * clone's rows ARE a snapshot that satisfied these constraints, so
    * re-validating (as [[add]] would) is a wasted scan.
    */
  private[sources] def copyTo(spark: SparkSession, srcDir: String, dstDir: String): Unit = {
    val cs = constraintsOf(spark, srcDir)
    if (cs.nonEmpty) write(spark, dstDir, cs)
  }

  /** Remove a constraint (no-op if absent). */
  def drop(spark: SparkSession, tableDir: String, name: String): Unit = {
    val existing = constraintsOf(spark, tableDir)
    if (existing.exists(_._1 == name))
      write(spark, tableDir, existing.filterNot(_._1 == name))
  }

  private def write(
      spark: SparkSession,
      tableDir: String,
      all: Seq[(String, String)]): Unit = {
    import org.json4s.JsonAST._
    val body = all.map { case (n, c) =>
      org.json4s.jackson.JsonMethods.compact(org.json4s.jackson.JsonMethods.render(
        JObject(List("name" -> (JString(n): JValue), "check" -> (JString(c): JValue)))))
    }.mkString("\n")
    val f = new org.apache.hadoop.fs.Path(tableDir).getFileSystem(
      spark.sessionState.newHadoopConf())
    f.mkdirs(new org.apache.hadoop.fs.Path(tableDir))
    val tmp = new org.apache.hadoop.fs.Path(tableDir, s".$FileName.tmp")
    val out = f.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    val dst = new org.apache.hadoop.fs.Path(tableDir, FileName)
    if (f.exists(dst)) f.delete(dst, false): Unit
    require(f.rename(tmp, dst), s"failed to publish $dst")
  }

  /** Commit-path hook: validate `batch` against the table's declared
    * constraints, throwing on any violation. Zero cost (one small-file
    * existence check) when the table has no constraints.
    */
  private[sources] def enforce(
      spark: SparkSession,
      tableDir: String,
      batch: DataFrame,
      op: String): Unit = {
    val cs = constraintsOf(spark, tableDir)
    if (cs.nonEmpty) enforceOn(batch, tableDir, cs, op)
  }

  private def enforceOn(
      batch: DataFrame,
      tableDir: String,
      cs: Seq[(String, String)],
      op: String): Unit = {
    // a batch may legally omit constrained columns (union-by-name
    // evolution): they read back NULL, so validate as NULL
    val withMissing = cs.foldLeft(batch) { (df, c) =>
      referencedMissing(df, c._2).foldLeft(df)((d, m) => d.withColumn(m, lit(null)))
    }
    val counts = withMissing.select(cs.map { case (n, p) =>
      sum(when(violates(p), 1L).otherwise(0L)).as(n)
    }: _*).head()
    val bad = cs.zipWithIndex.collect {
      case ((n, p), i) if !counts.isNullAt(i) && counts.getLong(i) > 0 =>
        s"'$n' CHECK ($p): ${counts.getLong(i)} row(s)"
    }
    if (bad.nonEmpty)
      throw new IllegalArgumentException(
        s"$op on $tableDir violates constraint(s) ${bad.mkString("; ")}")
  }

  /** FALSE violates; TRUE and NULL pass (SQL CHECK). */
  private def violates(check: String): Column = !coalesce(expr(check), lit(true))

  /** Columns the predicate references that `df` lacks. */
  private def referencedMissing(df: DataFrame, check: String): Seq[String] = {
    val have = df.columns.map(_.toLowerCase).toSet
    org.apache.spark.sql.catalyst.parser.CatalystSqlParser.parseExpression(check)
      .collect { case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        a.nameParts.head
      }.distinct
      .filterNot(r => have.contains(r.toLowerCase))
  }
}
