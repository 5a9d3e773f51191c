package graft.plans

import graft.sources.LakeTable
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Plan-quality splice for catalog reads the stock parquet scan cannot
  * serve: a [[graft.sources.LakeTable]] whose resolved version carries
  * pending merge-on-read deletes, or rename indirection (files hold data
  * under a column's former name), is replaced IN THE LOGICAL PLAN by the
  * library read ([[graft.sources.VersionedLake.readVersion]]) — the same
  * scoped broadcast anti-join / name-coalescing projection the V1Scan
  * bridge executes, but spliced as first-class plan instead of hidden
  * behind a `BaseRelation.buildScan` RDD.
  *
  * Why splice instead of bridging: Spark wraps every `V1Scan` in
  * `V1ScanWrapper`, which implements ONLY `Scan` — a
  * `SupportsReportStatistics` on the bridged scan is invisible to
  * `DataSourceV2ScanRelation.computeStats`, so the optimizer sizes the
  * bridged side at the default (no broadcast ever), and a V1 scan plans
  * as `RowDataSourceScanExec`, which consumes no runtime filters — a
  * MoR-maintained FACT table joined to a filtered dimension lost dynamic
  * partition pruning. Spliced, the inner reads are ordinary file-source
  * relations: byte-exact statistics from the file listing, filter and
  * column pushdown through the anti-join by Catalyst's own rules, and
  * dynamic partition pruning on hive-partitioned directories — all for
  * free, because the plan is declarative again.
  *
  * The rule leaves DML TARGETS untouched (DELETE resolves through
  * `SupportsDelete`, UPDATE/MERGE through [[LakeDmlRules]], all matching
  * the relation node), recurses into MERGE's source and INSERT's query,
  * and rewrites inside SUBQUERY EXPRESSIONS — a scalar/EXISTS/IN
  * subquery over a MoR-pending fact table plans the same spliced
  * file-source read as a top-level scan (previously it fell to the
  * stats-blind V1 bridge's `RowDataSourceScanExec`). A relation the
  * rule still skips falls back to the ScanBuilder's V1 bridge, which
  * remains correct — this rule is a strict plan-quality upgrade, never
  * a semantics carrier.
  *
  * Output attributes keep the relation's exprIds (each source column is
  * re-aliased under its original id), so references bound anywhere else
  * in the query keep resolving.
  */
object LakeReadThroughRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = rewrite(plan)

  private def rewrite(p: LogicalPlan): LogicalPlan = p match {
    // DML targets stay relations for LakeDmlRules / SupportsDelete; the
    // target is a CHILD of these nodes, so plain recursion would eat it
    case d: DeleteFromTable => d
    case u: UpdateTable => u
    case m: MergeIntoTable => m.copy(sourceTable = rewrite(m.sourceTable))
    // pre-resolution INSERT wraps its target as a child relation too
    case i: InsertIntoStatement => i.copy(query = rewrite(i.query))
    // UNFILTERED count(*) over a READ-THROUGH version (pending MoR
    // deletes with EXACT per-directory deleted counts recorded at
    // commit; rename indirection; mixed specs; decimal partitions —
    // none of which changes row counts): logical rows = Σ physical
    // #rows − Σ deleted, answered as a LocalRelation before the splice
    // would plan a real read. Strict shape: no grouping, no filter
    // between the aggregate and the relation, every aggregate a plain
    // non-distinct count(1) — anything else falls through to the
    // spliced read, which is exact.
    case agg: Aggregate if agg.resolved && agg.groupingExpressions.isEmpty &&
        agg.aggregateExpressions.nonEmpty &&
        agg.aggregateExpressions.forall(isBareCountStar) =>
      bareLakeRelation(agg.child)
        .flatMap(t => t.metaCountReadThrough)
        .map { n =>
          LocalRelation(
            agg.aggregateExpressions.map(_.toAttribute),
            Seq(org.apache.spark.sql.catalyst.InternalRow(
              agg.aggregateExpressions.map(_ => n): _*)))
        }
        .getOrElse(agg.mapChildren(rewrite))
    case r: DataSourceV2Relation if r.table.isInstanceOf[LakeTable] =>
      splice(r, r.table.asInstanceOf[LakeTable]).getOrElse(r)
    case other =>
      // subquery expressions carry whole plans OUTSIDE the child list —
      // without this, a lake relation inside EXISTS/IN/scalar subqueries
      // stays on the V1 bridge. transformExpressions touches only THIS
      // node's expressions; children get theirs on their own recursion.
      other.mapChildren(rewrite).transformExpressions {
        case se: org.apache.spark.sql.catalyst.expressions.SubqueryExpression
            if se.plan.resolved =>
          se.withNewPlan(rewrite(se.plan))
      }
  }

  /** A resolved non-distinct, unfiltered `count(1)` output column. */
  private def isBareCountStar(
      e: org.apache.spark.sql.catalyst.expressions.NamedExpression): Boolean = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
    e match {
      case Alias(ae: AggregateExpression, _) =>
        !ae.isDistinct && ae.filter.isEmpty && (ae.aggregateFunction match {
          case Count(Seq(l: Literal)) => l.value != null
          case _                      => false
        })
      case _ => false
    }
  }

  /** The lake relation under nothing but aliases/column-pruning — any
    * Filter/Join/etc. in between disqualifies the count shortcut.
    */
  private def bareLakeRelation(p: LogicalPlan): Option[LakeTable] = p match {
    case r: DataSourceV2Relation if r.table.isInstanceOf[LakeTable] =>
      Some(r.table.asInstanceOf[LakeTable])
    case s: SubqueryAlias => bareLakeRelation(s.child)
    case pr: Project
        if pr.projectList.forall(
          _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.Attribute]) =>
      bareLakeRelation(pr.child)
    case _ => None
  }

  private def splice(
      r: DataSourceV2Relation,
      t: LakeTable): Option[LogicalPlan] =
    t.readThroughVersion.flatMap { v =>
      val child = t.readThrough(v).queryExecution.analyzed
      val res = conf.resolver
      // every relation column must bind to exactly one source column; a
      // mismatch (never expected — both derive from the same committed
      // schema) falls back to the V1 bridge rather than guessing
      val bound = r.output.map { a =>
        child.output.filter(c => res(c.name, a.name)) match {
          case Seq(src) => Some(Alias(src, a.name)(exprId = a.exprId, qualifier = a.qualifier))
          case _        => None
        }
      }
      if (bound.exists(_.isEmpty)) None
      else Some(Project(bound.flatten, child))
    }
}
