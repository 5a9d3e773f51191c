package graft.plans

import graft.sources.{LakeTable, VersionedLake}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, Cast, EqualTo, Expression, PlanExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.graft.GraftDmlShim

/** SQL UPDATE and MERGE INTO for [[graft.sources.GraftCatalog]] tables,
  * routed through the lake's MINIMAL-rewrite machinery instead of
  * Spark's group-based row-level framework — the same analyzer-rewrite
  * approach Delta used pre-RowLevelOperations, chosen deliberately: the
  * framework's copy-on-write contract replaces every scanned group
  * (here: the whole table, since a manifest-resolved scan has no
  * group-filter column), while the lake already HAS the right physical
  * operations. The rule rewrites the analyzed plan into commands:
  *
  *   - `UPDATE graft.t SET c = e WHERE p` → [[UpdateLakeCommand]] →
  *     `VersionedLake.updateWhere` (stats/bloom-pruned copy-on-write —
  *     only directories containing matches rewrite; SQL pre-image
  *     semantics are the library call's own contract).
  *   - `MERGE INTO graft.t USING s ON t.k = s.k WHEN MATCHED THEN
  *     UPDATE SET * WHEN NOT MATCHED THEN INSERT *` (the CDC shape) →
  *     [[MergeLakeCommand]] → `VersionedLake.upsert` (keyed minimal
  *     CoW: only directories holding matched keys rewrite, new keys
  *     append).
  *   - `MERGE ... WHEN MATCHED THEN DELETE` (no other actions) →
  *     `VersionedLake.deleteKeys` — the GDPR id-list shape.
  *   - `MERGE ... WHEN MATCHED [AND p] THEN UPDATE SET c = expr, ...`
  *     (partial-column SET, expressions over target AND source) and
  *     `WHEN MATCHED AND p THEN DELETE` → [[MergePartialLakeCommand]]:
  *     new rows derive from a keyed target×source join evaluated with
  *     the analyzer's resolved trees, gate semantics are row-accurate
  *     (a duplicate-key row failing the gate survives untouched), and
  *     the result rides the same keyed minimal-CoW upsert.
  *
  * SQL DML takes the COPY-ON-WRITE twins, not `upsertMor`/
  * `deleteKeysMor`, on purpose: a merge-on-read commit leaves pending
  * equality deletes that the catalog's delegated parquet scan refuses
  * to read through, and a SQL user's next statement IS a catalog read —
  * the library MoR paths remain the right tool for ingest loops that
  * control their own read path and materialization cadence.
  *
  *   - `MERGE ... WHEN NOT MATCHED BY SOURCE [AND p] THEN DELETE /
  *     UPDATE SET ...` (standalone — the mirror-table sync statement)
  *     → the same command over the ANTI join.
  *
  * Statements outside these shapes (combined matched + by-source action
  * lists, non-equi merge conditions, key reassignment, subqueries in
  * predicates or assignments) are left untouched, so Spark surfaces its
  * own clear "not supported" error instead of this rule guessing at
  * semantics.
  * Commands carry analyzer-RESOLVED trees re-rendered as SQL text
  * (`Expression.sql`), re-parsed at execution against the library
  * call's own fresh scan — storing unresolved expression fields on a
  * command would send the analyzer chasing attributes a leaf node
  * cannot resolve.
  */
object LakeDmlRules extends Rule[LogicalPlan] {

  private def lakeOf(table: LogicalPlan): Option[LakeTable] =
    table.collectFirst {
      case r: DataSourceV2Relation if r.table.isInstanceOf[LakeTable] =>
        r.table.asInstanceOf[LakeTable]
    }.filter(_.pinnedVersion.isEmpty)

  /** Resolved tree → SQL text that re-resolves by name against a fresh
    * scan (None when the tree has no stable SQL rendering).
    */
  private def renderSql(e: Expression): Option[String] =
    scala.util.Try(
      // strip qualifiers: `gdml.upd.status` names the statement's
      // relation, not a column the library call's fresh scan knows
      e.transform { case a: AttributeReference => a.withQualifier(Nil) }.sql
    ).toOption

  private def hasSubquery(e: Expression): Boolean =
    e.exists(_.isInstanceOf[PlanExpression[_]])

  private def unwrap(e: Expression): Expression = e match {
    case Cast(c, _, _, _) => unwrap(c)
    case Alias(c, _)      => unwrap(c)
    case other            => other
  }

  /** `SET *` / `INSERT *` detection: every assignment writes a target
    * column from the same-named source attribute (modulo the casts/
    * aliases resolution inserts), and every target column is covered.
    */
  private def isStarAligned(
      assigns: Seq[Assignment],
      targetCols: Seq[Attribute],
      source: LogicalPlan): Boolean = {
    val sourceIds = source.outputSet
    val written = assigns.flatMap { a =>
      (unwrap(a.key), unwrap(a.value)) match {
        case (k: AttributeReference, v: AttributeReference)
            if sourceIds.contains(v) &&
              k.name.equalsIgnoreCase(v.name) => Some(k.name.toLowerCase)
        case _ => None
      }
    }.toSet
    written.size == assigns.size &&
      targetCols.forall(c => written.contains(c.name.toLowerCase))
  }

  /** The merge condition as AND-ed target=source column equalities →
    * the key column names (None when any conjunct is something else).
    * Resolution-inserted widening casts around either side unwrap —
    * `ON t.k = s.k` with INT source and BIGINT target is still a key
    * equality on k.
    */
  private def equiKeys(
      cond: Expression,
      target: LogicalPlan,
      source: LogicalPlan): Option[Seq[String]] = {
    val tIds = target.outputSet
    val sIds = source.outputSet
    def split(e: Expression): Option[Seq[String]] = e match {
      case And(l, r) => for { a <- split(l); b <- split(r) } yield a ++ b
      case EqualTo(l, r) =>
        (unwrap(l), unwrap(r)) match {
          case (a: AttributeReference, b: AttributeReference)
              if tIds.contains(a) && sIds.contains(b) &&
                a.name.equalsIgnoreCase(b.name) => Some(Seq(a.name))
          case (a: AttributeReference, b: AttributeReference)
              if sIds.contains(a) && tIds.contains(b) &&
                a.name.equalsIgnoreCase(b.name) => Some(Seq(b.name))
          case _ => None
        }
      case _ => None
    }
    split(cond)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {

    case u @ UpdateTable(table, assignments, condition)
        if u.resolved && lakeOf(table).isDefined &&
          !condition.exists(hasSubquery) &&
          assignments.forall(a => !hasSubquery(a.value)) &&
          assignments.forall(_.key.isInstanceOf[AttributeReference]) &&
          condition.forall(c => renderSql(c).isDefined) &&
          assignments.forall(a => renderSql(a.value).isDefined) =>
      val lake = lakeOf(table).get
      UpdateLakeCommand(
        lake.tableDir,
        condition.map(c => renderSql(c).get),
        assignments.map(a =>
          a.key.asInstanceOf[AttributeReference].name -> renderSql(a.value).get))

    // WHEN NOT MATCHED BY SOURCE [AND p] THEN DELETE / UPDATE SET ... —
    // the mirror-table sync statement (purge or mark target rows absent
    // from the source). Same gated machinery as the matched arms, over
    // the ANTI join: matching is per-key (equi condition), the gate per
    // row, and survivors of hit keys ride the probe-keyed upsert.
    case m @ MergeIntoTable(target, source, cond, Seq(), Seq(), Seq(action), false)
        if m.resolved && lakeOf(target).isDefined &&
          equiKeys(cond, target, source).isDefined && (action match {
            case DeleteAction(p) => p.forall(c => !hasSubquery(c))
            case UpdateAction(p, ua, _) =>
              p.forall(c => !hasSubquery(c)) &&
                ua.forall(a => unwrap(a.key).isInstanceOf[AttributeReference] &&
                  !hasSubquery(a.value)) &&
                ua.forall(a => !equiKeys(cond, target, source).get
                  .exists(_.equalsIgnoreCase(
                    unwrap(a.key).asInstanceOf[AttributeReference].name)))
            case _ => false
          }) =>
      val lake = lakeOf(target).get
      val ks = equiKeys(cond, target, source).get
      action match {
        case DeleteAction(p) =>
          MergePartialLakeCommand(lake.tableDir, target, source,
            ExprHolder(cond), p.map(ExprHolder), assignments = Nil,
            insert = None, target.output.map(_.name), ks, bySource = true)
        case UpdateAction(p, ua, _) =>
          MergePartialLakeCommand(lake.tableDir, target, source,
            ExprHolder(cond), p.map(ExprHolder),
            ua.map(a => unwrap(a.key).asInstanceOf[AttributeReference].name ->
              ExprHolder(a.value)),
            insert = None, target.output.map(_.name), ks, bySource = true)
        case _ => m
      }

    case m @ MergeIntoTable(target, source, cond, matched, notMatched, bySource, false)
        if m.resolved && lakeOf(target).isDefined && bySource.isEmpty =>
      val lake = lakeOf(target).get
      val keys = equiKeys(cond, target, source)
      val targetCols = target.output
      (keys, matched, notMatched) match {
        // CDC upsert: WHEN MATCHED UPDATE SET * + WHEN NOT MATCHED INSERT *
        case (Some(ks), Seq(UpdateAction(None, ua, _)), Seq(InsertAction(None, ia)))
            if isStarAligned(ua, targetCols, source) &&
              isStarAligned(ia, targetCols, source) =>
          MergeLakeCommand(lake.tableDir, source,
            targetCols.map(_.name), ks, delete = false)
        // keyed delete: WHEN MATCHED DELETE, nothing else
        case (Some(ks), Seq(DeleteAction(None)), Seq()) =>
          MergeLakeCommand(lake.tableDir, source,
            targetCols.map(_.name), ks, delete = true)
        // PARTIAL-COLUMN SET (the most common MERGE after CDC) and
        // conditional matched actions: `WHEN MATCHED [AND p] THEN
        // UPDATE SET c = expr, ...` — optionally + `WHEN NOT MATCHED
        // [AND q] THEN INSERT *`. New values come from a keyed inner
        // join of target×source evaluated with the analyzer's own
        // resolved expressions; the result rides the same keyed
        // minimal copy-on-write upsert. Keys must not be reassigned
        // (except the no-op star self-assignment) — rewriting a match
        // key mid-merge has no upsert rendering.
        case (Some(ks), Seq(UpdateAction(mCond, ua, _)), notM)
            if ua.forall(a => unwrap(a.key).isInstanceOf[AttributeReference]) &&
              ua.forall(a => !hasSubquery(a.value)) &&
              mCond.forall(c => !hasSubquery(c)) &&
              ua.forall { a =>
                val k = unwrap(a.key).asInstanceOf[AttributeReference]
                !ks.exists(_.equalsIgnoreCase(k.name)) || (unwrap(a.value) match {
                  case v: AttributeReference => v.name.equalsIgnoreCase(k.name)
                  case _ => false
                })
              } &&
              (notM match {
                case Seq() => true
                case Seq(InsertAction(iCond, ia)) =>
                  isStarAligned(ia, targetCols, source) && iCond.forall(!hasSubquery(_))
                case _ => false
              }) =>
          MergePartialLakeCommand(
            lake.tableDir, target, source, ExprHolder(cond),
            mCond.map(ExprHolder),
            ua.map(a => unwrap(a.key).asInstanceOf[AttributeReference].name ->
              ExprHolder(a.value)),
            insert = notM.headOption.map {
              case InsertAction(iCond, _) => iCond.map(ExprHolder)
              case _ => None
            },
            targetCols.map(_.name), ks)
        // conditional keyed delete: WHEN MATCHED AND p THEN DELETE
        case (Some(ks), Seq(DeleteAction(Some(p))), Seq()) if !hasSubquery(p) =>
          MergePartialLakeCommand(
            lake.tableDir, target, source, ExprHolder(cond),
            Some(ExprHolder(p)), assignments = Nil, insert = None,
            targetCols.map(_.name), ks)
        case _ => m
      }
  }
}

/** Opaque expression holder: keeps resolved trees OUT of a command's
  * `expressions` traversal (a leaf command cannot re-resolve attributes
  * that belong to the plans it carries as inner children).
  */
final case class ExprHolder(e: Expression)

/** Partial-column / conditional `MERGE` executed as the lake's keyed
  * minimal copy-on-write: matched rows re-derive from an inner join of
  * target×source on the merge condition (evaluated with the analyzer's
  * resolved expressions, so qualified references like `t.amt + c.delta`
  * keep their meaning), assignments overwrite only their columns, and
  * the full re-derived rows ride [[VersionedLake.upsert]] — only
  * directories holding matched keys rewrite. `assignments` empty means
  * the action is a conditional DELETE ([[VersionedLake.deleteKeys]] of
  * the gated matches). A matched row failing the action's condition is
  * simply absent from the batch — untouched by construction.
  */
final case class MergePartialLakeCommand(
    tableDir: String,
    target: LogicalPlan,
    source: LogicalPlan,
    cond: ExprHolder,
    matchedCond: Option[ExprHolder],
    assignments: Seq[(String, ExprHolder)],
    insert: Option[Option[ExprHolder]],
    targetCols: Seq[String],
    keys: Seq[String],
    bySource: Boolean = false) extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Nil

  override def innerChildren: Seq[LogicalPlan] = Seq(target, source)

  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.{coalesce, col, count, lit, when}
    val tgtDf = GraftDmlShim.ofRows(spark, target)
    val srcDf = GraftDmlShim.ofRows(spark, source)
    // SQL MERGE's unique-match rule, same check as the star-shape twin —
    // moot for the NOT MATCHED BY SOURCE anti-join (no row pairs up)
    if (!bySource) {
      val dups = srcDf.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("n")).filter(col("n") > 1).limit(1).collect()
      require(dups.isEmpty,
        s"MERGE source has multiple rows for key ${dups.headOption.getOrElse("")} — " +
          "SQL MERGE requires at most one source match per target row")
    }
    val tgtAttr = target.output.map(a => a.name.toLowerCase -> a).toMap
    val joined = tgtDf.join(srcDf, GraftDmlShim.column(cond.e),
      if (bySource) "left_anti" else "inner")
    val committed = VersionedLake.versionSchema(spark, tableDir,
      VersionedLake.currentVersion(spark, tableDir).get)
      .getOrElse(VersionedLake.read(spark, tableDir).schema)
    def typed(c: org.apache.spark.sql.Column, name: String) =
      c.cast(committed(committed.fieldIndex(name)).dataType)
    // flatten the ambiguous two-sided join into unambiguous columns:
    // target key copies, the gate verdict, every target column's old
    // value, and (for UPDATE) each assignment's new value — all computed
    // with the analyzer's resolved attributes BEFORE any self-reference
    // is possible. Row-accurate gating falls out: a target key may have
    // DUPLICATE rows with the gate true on some and false on others, and
    // the gate-failing rows must ride the batch unchanged (the keyed
    // rewrite replaces whole keys, so dropping them would lose rows).
    val gateCol = matchedCond
      .map(c => GraftDmlShim.column(c.e)).getOrElse(lit(true))
    val assignedOf = assignments.map { case (n, h) => n.toLowerCase -> h }.toMap
    val flat = joined.select(
      (keys.map(k => GraftDmlShim.column(tgtAttr(k.toLowerCase)).as(s"_gk_$k")) ++
        Seq(gateCol.as("_gate")) ++
        targetCols.map(c =>
          typed(GraftDmlShim.column(tgtAttr(c.toLowerCase)), c).as(s"_old_$c")) ++
        assignments.map { case (n, h) => typed(GraftDmlShim.column(h.e), n).as(s"_new_$n") }): _*)
    // keys where at least one row passes the gate — everything else is
    // untouched by construction (absent from batch AND probe). A NULL
    // gate is SQL's "condition not satisfied": the row takes no action.
    val hitKeys = flat.filter(col("_gate"))
      .select(keys.map(k => col(s"_gk_$k")): _*).distinct()
    // NULL merge keys cannot ride a keyed rewrite (equality never
    // matches NULL): in the matched arms they simply never match —
    // correct SQL — but the BY SOURCE anti-join SELECTS them, and
    // silently skipping would be a wrong answer; refuse loudly instead
    if (bySource) {
      val nullKeyed = hitKeys.filter(
        keys.map(k => col(s"_gk_$k").isNull).reduce(_ || _)).limit(1).collect()
      require(nullKeyed.isEmpty,
        "MERGE ... NOT MATCHED BY SOURCE selected target rows with NULL " +
          "merge keys, which the keyed rewrite cannot address; clean NULL " +
          "keys first (deleteWhere on the null predicate)")
    }
    val candidate = flat.join(hitKeys, keys.map(k => s"_gk_$k"), "left_semi")
    if (assignments.isEmpty) {
      // conditional DELETE: gate-passing rows vanish; gate-failing (or
      // NULL-gate) rows of the same keys survive as the upsert batch
      // (probeKeys carries the full key set being replaced) — !NULL is
      // NULL, so the survivor filter must coalesce, not negate
      val survivors = candidate.filter(!coalesce(col("_gate"), lit(false)))
        .select(targetCols.map(c => col(s"_old_$c").as(c)): _*)
      val delKeys = hitKeys.select(keys.map(k => col(s"_gk_$k").as(k)): _*)
      VersionedLake.upsert(spark, tableDir, survivors, keys,
        probeKeys = Some(delKeys)): Unit
    } else {
      val updated = candidate.select(targetCols.map { c =>
        (assignedOf.get(c.toLowerCase) match {
          case Some(_) => when(col("_gate"), col(s"_new_$c")).otherwise(col(s"_old_$c"))
          case None    => col(s"_old_$c")
        }).as(c)
      }: _*)
      val batch = insert match {
        case None => updated
        case Some(iCond) =>
          // star-aligned INSERT of source rows matching NO target key;
          // a row that matched but failed the UPDATE's condition is
          // matched — never inserted
          val unmatched = srcDf.join(tgtDf, GraftDmlShim.column(cond.e), "left_anti")
          val gatedIns = iCond
            .map(c => unmatched.filter(GraftDmlShim.column(c.e)))
            .getOrElse(unmatched)
          updated.unionByName(
            gatedIns.select(targetCols.map(c => typed(col(c), c).as(c)): _*))
      }
      VersionedLake.upsert(spark, tableDir, batch, keys): Unit
    }
    Nil
  }

  override def simpleString(maxFields: Int): String =
    s"MergePartialLakeCommand $tableDir keys=${keys.mkString(",")} " +
      s"set=${assignments.map(_._1).mkString(",")} insert=${insert.isDefined}"
}

/** `UPDATE` executed as the lake's minimal copy-on-write. */
final case class UpdateLakeCommand(
    tableDir: String,
    conditionSql: Option[String],
    assignments: Seq[(String, String)]) extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Nil

  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.{expr, lit}
    VersionedLake.updateWhere(
      spark, tableDir,
      conditionSql.map(expr).getOrElse(lit(true)),
      assignments.map { case (c, e) => c -> expr(e) }.toMap)
    Nil
  }

  override def simpleString(maxFields: Int): String =
    s"UpdateLakeCommand $tableDir SET ${assignments.map(a => s"${a._1} = ${a._2}").mkString(", ")}" +
      conditionSql.map(c => s" WHERE $c").getOrElse("")
}

/** CDC-shaped `MERGE` executed as the lake's keyed minimal copy-on-write
  * (or keyed delete): only directories holding matched keys rewrite, new
  * keys append — and the result reads cleanly through the catalog scan.
  * Enforces SQL MERGE's unique-match rule (a source with duplicate keys
  * would otherwise silently produce duplicate rows).
  */
final case class MergeLakeCommand(
    tableDir: String,
    source: LogicalPlan,
    targetCols: Seq[String],
    keys: Seq[String],
    delete: Boolean) extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Nil

  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.{col, count, lit}
    val src = GraftDmlShim.ofRows(spark, source)
    val dups = src.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n")).filter(col("n") > 1).limit(1).collect()
    require(dups.isEmpty,
      s"MERGE source has multiple rows for key ${dups.headOption.getOrElse("")} — " +
        "SQL MERGE requires at most one source match per target row")
    if (delete)
      VersionedLake.deleteKeys(spark, tableDir, src.select(keys.map(col): _*), keys)
    else {
      // align the source to the target's committed types (a VALUES
      // source types small ints as INT; the analyzer's casts live on the
      // MERGE plan we replaced, so re-apply them here)
      val committed = VersionedLake.versionSchema(spark, tableDir,
        VersionedLake.currentVersion(spark, tableDir).get)
        .getOrElse(VersionedLake.read(spark, tableDir).schema)
      val aligned = src.select(targetCols.map { c =>
        val t = committed(committed.fieldIndex(c)).dataType
        col(c).cast(t).as(c)
      }: _*)
      VersionedLake.upsert(spark, tableDir, aligned, keys)
    }
    Nil
  }

  override def simpleString(maxFields: Int): String =
    s"MergeLakeCommand $tableDir keys=${keys.mkString(",")} delete=$delete"
}
