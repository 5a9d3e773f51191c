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
  *     UPDATE SET ...` — the mirror-table sync arm, over the ANTI join.
  *   - Full composition: any number of gated `WHEN MATCHED` arms (first
  *     passing gate wins, SQL clause order), any number of gated `WHEN
  *     NOT MATCHED THEN INSERT` arms (star or explicit column lists
  *     with expressions over the source; unlisted columns insert NULL),
  *     and any number of gated `WHEN NOT MATCHED BY SOURCE` arms — all
  *     in ONE statement and ONE atomic keyed-CoW commit
  *     ([[MergePartialLakeCommand]]).
  *   - `MERGE WITH SCHEMA EVOLUTION INTO ...` — Spark's own
  *     `ResolveMergeIntoSchemaEvolution` widens the target through the
  *     catalog's `alterTable` (new source columns add, widenable types
  *     promote — both metadata-only manifest commits) and reloads the
  *     relation before this rule converts the now-aligned statement.
  *
  *   - Subqueries in arm gates and assignment values (`WHEN MATCHED
  *     AND t.k IN (SELECT ...) THEN ...`, `SET v = (SELECT ...)`) ride
  *     the arm dispatch into projections, where Spark 4.1 plans
  *     IN/EXISTS/scalar subqueries natively. Key-reassigning UPDATE
  *     arms render as delete+insert inside the same keyed-CoW commit
  *     (probe = pre-update keys, batch = post-update rows).
  *
  *   - Plain `UPDATE`/`DELETE` with UNCORRELATED subqueries in the
  *     predicate or assignment values (`DELETE FROM t WHERE k IN
  *     (SELECT ...)`, `UPDATE t SET v = (SELECT max(...) ...)`) →
  *     [[SubqueryDmlLakeCommand]]: target attributes rebind BY NAME
  *     (the subquery plans ride along analyzed), so the library's
  *     copy-on-write evaluates the exact statement predicate against
  *     its own scans. Correlated subqueries stay refused — their outer
  *     references name the statement's relation instance, which the
  *     library's fresh scans cannot re-resolve.
  *
  * Statements outside this surface (non-equi merge conditions,
  * correlated subqueries in plain UPDATE/DELETE) are
  * left untouched, so Spark surfaces its own clear "not supported"
  * error instead of this rule guessing at semantics.
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

  /** Rebind a resolved expression to resolve BY NAME against the library
    * call's own fresh scans: target attributes become unresolved names,
    * subquery plans ride along analyzed (their inner attributes are
    * self-contained). None when the expression cannot survive the trip —
    * a correlated subquery (its outer references name the statement's
    * relation instance, invisible to a fresh scan) or a reference
    * outside the target's output.
    */
  private def rebindByName(e: Expression, target: LogicalPlan): Option[Expression] = {
    val correlated = e.exists {
      case p: PlanExpression[_] => p.children.nonEmpty
      case _                    => false
    }
    if (correlated || !e.references.subsetOf(target.outputSet)) None
    else Some(e.transform {
      case a: AttributeReference =>
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted(a.name)
    })
  }

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

    // DYNAMIC PARTITION OVERWRITE — Spark has no V1 fallback exec for
    // OverwritePartitionsDynamic (TableCapabilityCheck demands pure-V2
    // BATCH_WRITE), so the statement rewrites here onto the atomic
    // replaceWhere: the partitions PRESENT in the batch replace, every
    // other one carries — the backfill shape, one minimal-CoW commit.
    case o @ OverwritePartitionsDynamic(table, query, _, _, _)
        if o.resolved && lakeOf(table).isDefined =>
      DynamicOverwriteLakeCommand(lakeOf(table).get.tableDir, query)

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

    // UPDATE with UNCORRELATED subqueries in the predicate or the
    // assignment values — the Delta "conditional sync" shape on a plain
    // UPDATE (`SET v = (SELECT ...) WHERE k IN (SELECT ...)`). The
    // resolved trees rebind by name and the library's minimal-CoW
    // updateWhere evaluates them verbatim; subqueries plan as real
    // semi-joins/scalar-subqueries inside each evaluation.
    case u @ UpdateTable(table, assignments, condition)
        if u.resolved && lakeOf(table).isDefined &&
          (condition.exists(hasSubquery) ||
            assignments.exists(a => hasSubquery(a.value))) &&
          assignments.forall(a => unwrap(a.key).isInstanceOf[AttributeReference]) &&
          condition.forall(c => rebindByName(c, table).isDefined) &&
          assignments.forall(a => rebindByName(a.value, table).isDefined) =>
      SubqueryDmlLakeCommand(
        lakeOf(table).get.tableDir,
        ExprHolder(condition.map(c => rebindByName(c, table).get)
          .getOrElse(org.apache.spark.sql.catalyst.expressions.Literal(true))),
        assignments.map(a =>
          unwrap(a.key).asInstanceOf[AttributeReference].name ->
            ExprHolder(rebindByName(a.value, table).get)))

    // DELETE whose predicate carries an UNCORRELATED subquery — the
    // GDPR/allow-list shape (`DELETE FROM t WHERE k IN (SELECT ...)`).
    // Pushable predicates keep the SupportsDelete fast path; this case
    // takes exactly the statements that path must refuse.
    case d @ DeleteFromTable(table, condition)
        if d.resolved && lakeOf(table).isDefined && hasSubquery(condition) &&
          rebindByName(condition, table).isDefined =>
      SubqueryDmlLakeCommand(
        lakeOf(table).get.tableDir,
        ExprHolder(rebindByName(condition, table).get),
        Nil)

    // MERGE, general composition: any of `WHEN MATCHED [AND p] THEN
    // UPDATE/DELETE` (multiple arms, first passing gate wins — SQL's
    // clause-order semantics), `WHEN NOT MATCHED [AND q] THEN INSERT`
    // (multiple arms, star or explicit column lists), and `WHEN NOT
    // MATCHED BY SOURCE [AND r] THEN UPDATE/DELETE` (multiple arms) —
    // in ONE statement, the full mirror-table sync. The two star-aligned
    // fast paths keep their direct rendering (no flat-join machinery for
    // the CDC shapes); everything else converts arm-by-arm — including
    // subquery gates/values and key-reassigning updates — and any arm
    // outside the supported surface (a non-attribute assignment target)
    // leaves the statement untouched so Spark's own error surfaces.
    // `WITH SCHEMA EVOLUTION` composes for free: Spark's own
    // ResolveMergeIntoSchemaEvolution (same fixed-point batch) widens the
    // target through this catalog's alterTable — AddColumn for new source
    // columns, UpdateColumnType for widenable ones, each a metadata-only
    // manifest commit — and reloads the relation; the needSchemaEvolution
    // guard keeps this rule out of the way until that has happened, at
    // which point the statement is an ordinary aligned MERGE over the
    // evolved schema.
    case m @ MergeIntoTable(target, source, cond, matched, notMatched, bySource, _)
        if m.resolved && !m.needSchemaEvolution && lakeOf(target).isDefined &&
          equiKeys(cond, target, source).isDefined =>
      val lake = lakeOf(target).get
      val ks = equiKeys(cond, target, source).get
      val targetCols = target.output

      /** UPDATE/DELETE action → arm; None = unsupported shape.
        *
        * Subqueries in gates and assignment values are IN surface:
        * the arms execute as CASE dispatch inside projections over the
        * matched/by-source join, and Spark 4.1 plans IN/EXISTS/scalar
        * subqueries in projections natively (verified: `CASE WHEN k IN
        * (SELECT ...)` in a SELECT list analyzes, decorrelates and
        * executes) — so the gate's `IN (SELECT ...)` is the same plan
        * the identical SELECT expression would get, semi-join and all.
        *
        * KEY REASSIGNMENT is also in surface: the keyed-CoW rendering
        * probes the arms' hit keys (the PRE-update values, captured off
        * the target side of the join) while the batch carries the
        * post-update rows — so `SET k = k + 1000` deletes the old key's
        * rows from their directories and appends the new-key rows, one
        * atomic commit, and SQL's no-uniqueness contract is preserved
        * (reassigning onto an existing key coexists with that key's
        * untouched rows, exactly as UPDATE would).
        */
      def arm(a: MergeAction): Option[MergeArm] = a match {
        case DeleteAction(p) =>
          Some(MergeArm(p.map(ExprHolder), Nil))
        case UpdateAction(p, ua, _)
            if ua.forall(x => unwrap(x.key).isInstanceOf[AttributeReference]) =>
          Some(MergeArm(p.map(ExprHolder),
            ua.map(x => unwrap(x.key).asInstanceOf[AttributeReference].name ->
              ExprHolder(x.value))))
        case _ => None
      }

      (matched, notMatched, bySource) match {
        // CDC upsert: WHEN MATCHED UPDATE SET * + WHEN NOT MATCHED INSERT *
        case (Seq(UpdateAction(None, ua, _)), Seq(InsertAction(None, ia)), Seq())
            if isStarAligned(ua, targetCols, source) &&
              isStarAligned(ia, targetCols, source) =>
          MergeLakeCommand(lake.tableDir, source,
            targetCols.map(_.name), ks, delete = false)
        // keyed delete: WHEN MATCHED DELETE, nothing else
        case (Seq(DeleteAction(None)), Seq(), Seq()) =>
          MergeLakeCommand(lake.tableDir, source,
            targetCols.map(_.name), ks, delete = true)
        case _ =>
          val matchedArms = matched.map(arm)
          val bySourceArms = bySource.map(arm)
          // INSERT arms generalize past star alignment: any column
          // subset, expressions over the source, N gated arms (first
          // passing gate wins — SQL clause order); unlisted target
          // columns insert NULL. `INSERT *` resolves to same-name
          // source-attribute assignments, so it is just the widest
          // instance of the same shape. None = unsupported (subquery,
          // non-source reference) → the statement stays untouched and
          // Spark's own error surfaces.
          def insArm(a: MergeAction): Option[InsertArm] = a match {
            case InsertAction(iCond, ia)
                if ia.forall(x => unwrap(x.key).isInstanceOf[AttributeReference] &&
                  // a SubqueryExpression's `references` are its OUTER
                  // refs only, so subquery-bearing values pass exactly
                  // when their correlation stays on the source side
                  x.value.references.subsetOf(source.outputSet)) =>
              Some(InsertArm(iCond.map(ExprHolder),
                ia.map(x => unwrap(x.key).asInstanceOf[AttributeReference].name ->
                  ExprHolder(x.value))))
            case _ => None
          }
          val insertArms = notMatched.map(insArm)
          if (matchedArms.exists(_.isEmpty) || bySourceArms.exists(_.isEmpty) ||
            insertArms.exists(_.isEmpty)) m
          else MergePartialLakeCommand(
            lake.tableDir, target, source, ExprHolder(cond),
            matchedArms.flatten, insertArms.flatten, bySourceArms.flatten,
            targetCols.map(_.name), ks)
      }
  }
}

/** Opaque expression holder: keeps resolved trees OUT of a command's
  * `expressions` traversal (a leaf command cannot re-resolve attributes
  * that belong to the plans it carries as inner children).
  */
final case class ExprHolder(e: Expression)

/** One gated MERGE action over an already-classified row population:
  * `gate` is the clause's AND condition (None = unconditional),
  * `assignments` the UPDATE SET pairs — empty means DELETE.
  */
final case class MergeArm(
    gate: Option[ExprHolder],
    assignments: Seq[(String, ExprHolder)])

/** One gated `WHEN NOT MATCHED THEN INSERT` arm: `gate` the AND
  * condition (None = unconditional), `assignments` the inserted
  * (column, value-over-source) pairs — target columns not listed
  * insert NULL, per SQL.
  */
final case class InsertArm(
    gate: Option[ExprHolder],
    assignments: Seq[(String, ExprHolder)])

/** General `MERGE` executed as ONE keyed minimal copy-on-write: matched
  * arms re-derive rows from an inner join of target×source on the merge
  * condition (evaluated with the analyzer's resolved expressions, so
  * qualified references like `t.amt + c.delta` keep their meaning),
  * NOT MATCHED BY SOURCE arms run the same machinery over the ANTI
  * join, and the INSERT arms append source rows matching no target key
  * (first passing gate supplies the values, unlisted columns NULL) —
  * all three populations land in a single
  * [[VersionedLake.upsert]] whose probe keys are the union of the arms'
  * hit keys, so only directories holding touched keys rewrite and the
  * statement stays one atomic commit.
  *
  * Arm semantics are SQL's: arms evaluate in clause order and the FIRST
  * arm whose gate passes acts (a NULL gate is "not satisfied"); a row
  * passing no arm — including gate-failing duplicate rows of a key
  * another row hit — rides the batch unchanged, because the keyed
  * rewrite replaces whole keys and dropping them would lose rows.
  * Populations are disjoint by construction (a target key is matched
  * XOR by-source; insert keys match nothing), so the one-commit union
  * cannot double-apply.
  */
final case class MergePartialLakeCommand(
    tableDir: String,
    target: LogicalPlan,
    source: LogicalPlan,
    cond: ExprHolder,
    matchedArms: Seq[MergeArm],
    insertArms: Seq[InsertArm],
    bySourceArms: Seq[MergeArm],
    targetCols: Seq[String],
    keys: Seq[String]) extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Nil

  override def innerChildren: Seq[LogicalPlan] = Seq(target, source)

  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.{col, count, lit, when}
    val tgtDf = GraftDmlShim.ofRows(spark, target)
    // the source feeds up to four consumers (dup probe, matched join,
    // by-source anti-join, insert anti-join): persist it once instead of
    // re-evaluating a possibly expensive — or non-deterministic — source
    // plan per consumer; serialized blocks, released before return
    val srcDf = GraftDmlShim.ofRows(spark, source)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    try {
      // SQL MERGE's unique-match rule: duplicates are only illegal for
      // keys that actually MATCH a target row (an unmatched duplicate
      // legally inserts twice). Cheap source-only probe first; the
      // target-key refinement — a pruned key-column scan — runs only
      // when duplicates exist at all. READ-ONLY refusal gate, so it runs
      // on a background thread and is awaited by the upsert just before
      // its first side effect (guide §2.6): the probe overlaps the arm
      // flattening, the null-key probe and the upsert's own key-range /
      // manifest phases instead of serializing ahead of them.
      val dupGate: () => Unit =
        if (matchedArms.isEmpty) VersionedLake.NoGate
        else VersionedLake.backgroundGate(spark, "merge: dup probe") {
          val dups = srcDf.groupBy(keys.map(col): _*)
            .agg(count(lit(1)).as("n")).filter(col("n") > 1)
          if (dups.limit(1).collect().nonEmpty) {
            val offending = dups
              .join(tgtDf.select(keys.map(col): _*).distinct(), keys, "left_semi")
              .limit(1).collect()
            offending.foreach { r =>
              val rendered = keys.zipWithIndex
                .map { case (k, i) => s"$k=${r.get(i)}" }.mkString(", ")
              throw new IllegalArgumentException(
                s"MERGE source has multiple rows for matched key ($rendered) - " +
                  "SQL MERGE requires at most one source match per target row")
            }
          }
        }
      val tgtAttr = target.output.map(a => a.name.toLowerCase -> a).toMap
      val committed = VersionedLake.versionSchema(spark, tableDir,
        VersionedLake.currentVersion(spark, tableDir).get)
        .getOrElse(VersionedLake.read(spark, tableDir).schema)
      def typed(c: org.apache.spark.sql.Column, name: String) =
        c.cast(committed(committed.fieldIndex(name)).dataType)

      /** Flatten one population (the matched inner join or the by-source
        * anti-join) into unambiguous columns — target key copies, the
        * index of the first arm whose gate passes (-1: none), every
        * target column's old value, each arm-assignment's new value —
        * then derive (surviving batch rows, hit keys).
        */
      // flats persisted for the upsert's lifetime (batch and probe both
      // derive from them and materialize at different phases), released
      // in the finally below
      val persistedFlats =
        scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.DataFrame]
      def armBatch(
          joined: org.apache.spark.sql.DataFrame,
          arms: Seq[MergeArm],
          persistFlat: Boolean): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
        val armCol = arms.zipWithIndex.foldRight(lit(-1)) { case ((a, i), els) =>
          when(a.gate.map(h => GraftDmlShim.column(h.e)).getOrElse(lit(true)), lit(i))
            .otherwise(els)
        }
        // each arm's value expressions evaluate ONLY for rows the arm
        // dispatch actually selects (CASE WHEN branches are conditional
        // in both codegen and interpreted eval): a gate guarding a
        // throwing expression — `WHEN MATCHED AND denom <> 0 THEN SET r
        // = num / denom` — must suppress the division for gate-failing
        // rows under ANSI, exactly as clause-order MERGE semantics say
        val newCols = arms.zipWithIndex.flatMap { case (a, i) =>
          a.assignments.map { case (n, h) =>
            typed(when(armCol === lit(i), GraftDmlShim.column(h.e)), n)
              .as(s"_new_${i}_$n")
          }
        }
        val flat0 = joined.select(
          (keys.map(k => GraftDmlShim.column(tgtAttr(k.toLowerCase)).as(s"_gk_$k")) ++
            Seq(armCol.as("_arm")) ++
            targetCols.map(c =>
              typed(GraftDmlShim.column(tgtAttr(c.toLowerCase)), c).as(s"_old_$c")) ++
            newCols): _*)
        // the MATCHED flat (inner join: bounded by source matches — the
        // CDC delta) is read by hitKeys, the candidate semi-join AND the
        // probe's separate materialization: persist it once instead of
        // re-running the target×source join (with its gate subqueries)
        // three times. The BY SOURCE flat stays UNcached on purpose: its
        // pre-gate population (target anti source) can approach the
        // target's size, and caching it would not survive 100 TB.
        val flat =
          if (!persistFlat) flat0
          else {
            val p = flat0.persist(
              org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
            persistedFlats += p
            p
          }
        // keys where at least one row hit an arm — everything else is
        // untouched by construction (absent from batch AND probe)
        val hitKeys = flat.filter(col("_arm") >= 0)
          .select(keys.map(k => col(s"_gk_$k")): _*).distinct()
        val candidate = flat.join(hitKeys, keys.map(k => s"_gk_$k"), "left_semi")
        val deleteArms = arms.zipWithIndex.collect {
          case (a, i) if a.assignments.isEmpty => i
        }
        // delete-arm rows vanish; rows hitting no arm (_arm = -1,
        // including NULL-gate rows) keep old values
        val survivors =
          if (deleteArms.isEmpty) candidate
          else candidate.filter(!col("_arm").isin(deleteArms.map(Int.box): _*))
        val out = survivors.select(targetCols.map { c =>
          arms.zipWithIndex.foldRight(col(s"_old_$c")) { case ((a, i), els) =>
            if (a.assignments.exists(_._1.equalsIgnoreCase(c)))
              when(col("_arm") === i, col(s"_new_${i}_$c")).otherwise(els)
            else els
          }.as(c)
        }: _*)
        (out, hitKeys.select(keys.map(k => col(s"_gk_$k").as(k)): _*))
      }

      val matchedPiece =
        if (matchedArms.isEmpty) None
        else Some(armBatch(
          tgtDf.join(srcDf, GraftDmlShim.column(cond.e), "inner"), matchedArms,
          persistFlat = true))
      val bySourcePiece =
        if (bySourceArms.isEmpty) None
        else Some(armBatch(
          tgtDf.join(srcDf, GraftDmlShim.column(cond.e), "left_anti"), bySourceArms,
          persistFlat = false))
      val insertRows =
        if (insertArms.isEmpty) None
        else Some {
          // INSERT arms over source rows matching NO target key (a row
          // that matched but failed every matched gate is still matched
          // — never inserted): first arm whose gate passes supplies the
          // values, a row passing no arm is not inserted, unlisted
          // target columns insert NULL
          val unmatched = srcDf.join(tgtDf, GraftDmlShim.column(cond.e), "left_anti")
          val armCol = insertArms.zipWithIndex.foldRight(lit(-1)) { case ((a, i), els) =>
            when(a.gate.map(h => GraftDmlShim.column(h.e)).getOrElse(lit(true)), lit(i))
              .otherwise(els)
          }
          // as in armBatch: value expressions evaluate only for rows the
          // dispatch selects the arm for (ANSI-safe gated expressions)
          val valCols = insertArms.zipWithIndex.flatMap { case (a, i) =>
            a.assignments.map { case (n, h) =>
              typed(when(armCol === lit(i), GraftDmlShim.column(h.e)), n)
                .as(s"_ins_${i}_${n.toLowerCase}")
            }
          }
          val flat = unmatched.select(armCol.as("_arm") +: valCols: _*)
          flat.filter(col("_arm") >= 0).select(targetCols.map { c =>
            val dt = committed(committed.fieldIndex(c)).dataType
            insertArms.zipWithIndex.foldRight(lit(null).cast(dt)) { case ((a, i), els) =>
              if (a.assignments.exists(_._1.equalsIgnoreCase(c)))
                when(col("_arm") === i, col(s"_ins_${i}_${c.toLowerCase}")).otherwise(els)
              else els
            }.as(c)
          }: _*)
        }
      // persist the BOUNDED frames (touched rows / touched keys — never
      // the target): the upsert evaluates its batch for the key-range
      // probe, the directory rewrite, the appended directory, AND the
      // artifact classification — un-cached, each evaluation re-runs the
      // target×source joins (the driver record showed the three-clause
      // statement paying ~4× its own scan cost). `flat` stays UNcached
      // on purpose: the by-source population pre-gate can approach the
      // target's size, and caching it would not survive 100 TB.
      val ser = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
      val batch = (matchedPiece.map(_._1) ++ bySourcePiece.map(_._1) ++ insertRows)
        .reduce(_.unionByName(_)).persist(ser)
      val probe = (matchedPiece.map(_._2) ++ bySourcePiece.map(_._2))
        .reduceOption(_.unionByName(_)).map(_.persist(ser))
      // NULL merge keys cannot ride a keyed rewrite (equality never
      // matches NULL): in the matched arms they simply never match —
      // correct SQL — but the BY SOURCE anti-join SELECTS them, and
      // silently skipping would be a wrong answer; refuse loudly. The
      // check runs on the PERSISTED probe union (matched keys come off
      // an equi-join and cannot be NULL, so any NULL here is by-source),
      // which makes the refusal job the same job that warms the cache
      // the upsert's key-range probe reads next — one target anti-join
      // evaluation, not two (concurrent probe/key-range materialization
      // of the same cache is block-granular: the block manager's write
      // locks make the loser read the winner's block, not recompute it).
      // Like the dup probe, this is a READ-ONLY refusal gate: it runs in
      // the background and the upsert awaits it before its first side
      // effect, so it overlaps the key-range and manifest phases.
      val nullKeyGate: () => Unit =
        if (bySourceArms.isEmpty) VersionedLake.NoGate
        else probe.fold(VersionedLake.NoGate) { p =>
          VersionedLake.backgroundGate(spark, "merge: null-key probe") {
            val nullKeyed = p.filter(
              keys.map(k => col(k).isNull).reduce(_ || _)).limit(1).collect()
            require(nullKeyed.isEmpty,
              "MERGE ... NOT MATCHED BY SOURCE selected target rows with NULL " +
                "merge keys, which the keyed rewrite cannot address; clean NULL " +
                "keys first (deleteWhere on the null predicate)")
          }
        }
      try {
        // probe = the arms' hit keys (whole keys being replaced); an
        // insert-only MERGE probes its own batch keys, which match
        // nothing by construction — a plain append in rewrite clothing.
        // Await order is fixed (dup, then null-key) so a doubly-refused
        // statement reports the same error it always did.
        VersionedLake.upsert(spark, tableDir, batch, keys, probeKeys = probe,
          preWriteGate = () => { dupGate(); nullKeyGate() }): Unit
      } finally {
        probe.foreach(_.unpersist(blocking = false))
        batch.unpersist(blocking = false)
        persistedFlats.foreach(_.unpersist(blocking = false))
      }
      Nil
    } finally srcDf.unpersist(blocking = false)
  }

  override def simpleString(maxFields: Int): String =
    s"MergePartialLakeCommand $tableDir keys=${keys.mkString(",")} " +
      s"matched=${matchedArms.size} insert=${insertArms.size} " +
      s"bySource=${bySourceArms.size}"
}

/** `UPDATE` executed as the lake's minimal copy-on-write. */
final case class UpdateLakeCommand(
    tableDir: String,
    conditionSql: Option[String],
    assignments: Seq[(String, String)]) extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Nil

  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.{expr, lit}
    val cond = conditionSql.map(expr).getOrElse(lit(true))
    val assigns = assignments.map { case (c, e) => c -> expr(e) }.toMap
    if (graft.sources.LakeProps.updateModeMor(spark, tableDir))
      VersionedLake.updateWhereMor(spark, tableDir, cond, assigns): Unit
    else
      VersionedLake.updateWhere(spark, tableDir, cond, assigns): Unit
    Nil
  }

  override def simpleString(maxFields: Int): String =
    s"UpdateLakeCommand $tableDir SET ${assignments.map(a => s"${a._1} = ${a._2}").mkString(", ")}" +
      conditionSql.map(c => s" WHERE $c").getOrElse("")
}

/** Subquery-bearing `UPDATE`/`DELETE` (empty `assignments` = DELETE)
  * executed as the lake's minimal copy-on-write: the rebound-by-name
  * condition — uncorrelated subqueries riding along analyzed — feeds
  * [[VersionedLake.updateWhere]]/[[VersionedLake.deleteWhere]] directly,
  * so an `IN (SELECT ...)` gate plans as a semi-join inside each of the
  * copy-on-write's passes (directory attribution, rewrite, CDC
  * artifact), never a driver-collected list.
  *
  * The subquery re-evaluates per pass. Over lake tables that is a
  * version-pinned read (each pass sees the same snapshot the statement
  * started from unless a concurrent commit lands mid-statement — the
  * same read-committed window Delta's non-materialized DELETE
  * subqueries have); a non-deterministic subquery source (a changing
  * temp view) is the caller's contract to avoid, as in any engine that
  * does not materialize DML sources.
  */
final case class SubqueryDmlLakeCommand(
    tableDir: String,
    cond: ExprHolder,
    assignments: Seq[(String, ExprHolder)]) extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Nil

  override def run(spark: SparkSession): Seq[Row] = {
    val c = GraftDmlShim.column(cond.e)
    if (assignments.isEmpty)
      // honor the table's delete mode, like the SupportsDelete path
      if (graft.sources.LakeProps.deleteModeMor(spark, tableDir))
        VersionedLake.deleteWhereMor(spark, tableDir, c): Unit
      else
        VersionedLake.deleteWhere(spark, tableDir, c): Unit
    else {
      val assigns = assignments.map { case (n, h) => n -> GraftDmlShim.column(h.e) }.toMap
      if (graft.sources.LakeProps.updateModeMor(spark, tableDir))
        VersionedLake.updateWhereMor(spark, tableDir, c, assigns): Unit
      else
        VersionedLake.updateWhere(spark, tableDir, c, assigns): Unit
    }
    Nil
  }

  override def simpleString(maxFields: Int): String =
    s"SubqueryDmlLakeCommand $tableDir " +
      (if (assignments.isEmpty) "DELETE"
       else s"SET ${assignments.map(_._1).mkString(", ")}")
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
    // read-only refusal gate on a background thread (guide §2.6): the
    // upsert awaits it before its first side effect, so the probe
    // overlaps the key-range aggregation and manifest reads instead of
    // serializing ahead of them; the delete path (no gate plumbing)
    // awaits it inline, which is exactly the old serial order
    val dupGate = VersionedLake.backgroundGate(spark, "merge: dup probe") {
      val dups = src.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("n")).filter(col("n") > 1).limit(1).collect()
      require(dups.isEmpty,
        s"MERGE source has multiple rows for key ${dups.headOption.getOrElse("")} — " +
          "SQL MERGE requires at most one source match per target row")
    }
    if (delete) {
      dupGate()
      VersionedLake.deleteKeys(spark, tableDir, src.select(keys.map(col): _*), keys)
    } else {
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
      VersionedLake.upsert(spark, tableDir, aligned, keys, preWriteGate = dupGate)
    }
    Nil
  }

  override def simpleString(maxFields: Int): String =
    s"MergeLakeCommand $tableDir keys=${keys.mkString(",")} delete=$delete"
}

/** `INSERT OVERWRITE` in dynamic-partition mode (and
  * `DataFrameWriterV2.overwritePartitions()`): the batch's distinct
  * partition tuples — a collect bounded by partitions TOUCHED, never
  * rows — become the replace predicate of ONE atomic
  * [[VersionedLake.replaceWhere]] commit. The batch is persisted across
  * its two consumers (tuple probe, data write).
  */
final case class DynamicOverwriteLakeCommand(
    tableDir: String,
    query: LogicalPlan) extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Nil

  override def innerChildren: Seq[LogicalPlan] = Seq(query)

  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.{col, lit}
    val data = GraftDmlShim.ofRows(spark, query)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    try {
      val cur = VersionedLake.currentVersion(spark, tableDir).getOrElse(
        throw new IllegalStateException(s"no published version in $tableDir"))
      val parts = VersionedLake.declaredOrPhysicalParts(spark, tableDir, cur)
      require(parts.nonEmpty,
        s"dynamic partition overwrite needs a partitioned table: $tableDir")
      val tuples = data.select(parts.map(col): _*).distinct().collect()
      // an empty batch touches no partition: native dynamic-overwrite
      // semantics replace nothing — committing would pollute the history
      // and the CDC feed with a zero-row version per scheduled no-op run
      if (tuples.isEmpty) return Nil
      require(tuples.length <= 100000,
        s"batch touches ${tuples.length} partitions - above the " +
          "dynamic-overwrite literal bound; overwrite by predicate instead")
      // BALANCED or-tree: a left-deep reduce of N terms recurses N deep
      // through every catalyst transform and overflows the stack in the
      // low thousands — log2(100k) = 17 levels survives the stated bound
      def balancedOr(es: IndexedSeq[org.apache.spark.sql.Column]): org.apache.spark.sql.Column =
        if (es.size == 1) es.head
        else {
          val (l, r) = es.splitAt(es.size / 2)
          balancedOr(l) || balancedOr(r)
        }
      val pred = balancedOr(tuples.toIndexedSeq
        .map(r => parts.zipWithIndex
          .map { case (p, i) => col(p) <=> lit(r.get(i)) }
          .reduce(_ && _)))
      VersionedLake.replaceWhere(spark, tableDir, pred, data): Unit
      Nil
    } finally data.unpersist(blocking = false)
  }

  override def simpleString(maxFields: Int): String =
    s"DynamicOverwriteLakeCommand $tableDir"
}
