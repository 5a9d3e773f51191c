package graft.plans

import graft.sources.{LakeMv, LakeTable}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{col, sum => fsum, min => fmin, max => fmax}
import org.apache.spark.sql.graft.Bridge

/** AUTOMATIC QUERY REWRITE onto a maintained materialized view — the
  * classic warehouse bargain (Calcite/Oracle `QUERY REWRITE`, BigQuery
  * BI Engine, Databricks MV routing) as a Catalyst rule: an aggregate
  * over a lake table registered in [[graft.sources.LakeMv]] re-plans as
  * an aggregate over the view's O(groups) state table whenever the view
  * can answer it exactly. At 100 TB the substitution is the difference
  * between scanning the fact table and scanning a few thousand partial
  * state rows — and the view itself costs O(delta) per corpus commit to
  * maintain ([[graft.sources.LakeView.sync]]), so "query the rollup" is
  * amortized into the ingest path the way bucketing amortizes the join
  * shuffle.
  *
  * A rewrite fires only when ALL of:
  *  - the aggregate's child is (a filter over) the registered corpus
  *    table read AT ITS CURRENT VERSION (time travel pins stay on the
  *    corpus — a view reflects one version only);
  *  - the view can answer the CURRENT version exactly: fresh (watermark
  *    = current), or stale behind PURE APPENDS — then the plan merges
  *    the state with a mechanical aggregate of just the unsynced tail
  *    directories ([[LakeMv.readCombined]]); a window containing any
  *    rewrite declines (metadata-only checks per plan);
  *  - grouping expressions are plain corpus columns ⊆ the view keys
  *    (equality yields the view's own grain; a strict subset ROLLS UP by
  *    re-aggregating state — sums add, counts add, mins min);
  *  - any filter is deterministic and touches view key columns only
  *    (key predicates commute with the per-key aggregation, so they
  *    apply verbatim to state rows; a measure predicate would not);
  *  - every aggregate derives from registered state: sum(c) from a
  *    (sum,c) state via re-sum, count(*)/count(1) from (count,*) via
  *    re-sum, count(c) (non-null) from a (count,c) state via re-sum,
  *    min/max(c) from (min/max,c), avg(c) from (sum,c)+(count,c) as a
  *    quotient of re-sums, hll_sketch_estimate(hll_sketch_agg(c)) from
  *    an (hll,c) sketch state via union (estimate-exact — see derive);
  *    first/last/exact-DISTINCT/approx_count_distinct do not.
  *
  * The replacement is built with the DataFrame API against
  * [[LakeView.read]]'s merged state (so liveness filtering and partial
  * merge semantics stay in ONE place) and spliced under a Project that
  * re-aliases every output under the original attribute's exprId — the
  * same contract as [[LakeReadThroughRule]], so references above the
  * aggregate keep resolving. Anything the rule declines falls through
  * to the ordinary corpus scan: the rewrite is a strict plan upgrade,
  * never a semantics carrier.
  */
object MvRewriteRule extends Rule[LogicalPlan] {

  /** Re-entrancy guard: building the replacement analyzes a nested plan
    * (the view read), which runs this rule again. The nested plan can
    * never match (the view dir is not a registered corpus), but a guard
    * makes non-recursion a property, not a hope.
    */
  private val rewriting = new ThreadLocal[Boolean] {
    override def initialValue(): Boolean = false
  }

  /** Parsed+analyzed registered source expressions, keyed by (source
    * SQL, child attribute names/types) — the schema key makes a cache
    * hit safe across queries and registrations while coercion stays
    * schema-dependent. Entries are tiny expression trees; normalize()
    * strips their attribute ids before comparison, so reuse across
    * plans with different exprIds is sound.
    */
  private[plans] val srcCache = scala.collection.concurrent.TrieMap
    .empty[(String, List[(String, org.apache.spark.sql.types.DataType)]),
      Option[Expression]]

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (LakeMv.isEmpty || rewriting.get()) plan
    else plan.transformUpWithSubqueries {
      case a: Aggregate if a.resolved => tryRewrite(a).getOrElse(a)
    }

  /** The aggregate child shapes a user query produces: the relation
    * itself, behind its catalog alias, an optional key-only filter, and
    * optional pure-projection nodes from DataFrame `select`s.
    */
  private def destructure(
      p: LogicalPlan): Option[(LakeTable, Option[Expression])] = p match {
    case SubqueryAlias(_, child) => destructure(child)
    case Project(exprs, child) if exprs.forall(_.isInstanceOf[AttributeReference]) =>
      destructure(child)
    case Filter(cond, child) =>
      destructure(child).flatMap {
        // one filter shape is enough: nested filters analyze merged, and
        // a second distinct Filter node (via DataFrame chaining) ANDs
        case (t, None)    => Some((t, Some(cond)))
        case (t, Some(c)) => Some((t, Some(And(cond, c))))
      }
    case r: DataSourceV2Relation =>
      r.table match {
        case t: LakeTable if t.pinnedVersion.isEmpty => Some((t, None))
        case _                                       => None
      }
    case _ => None
  }

  private def tryRewrite(a: Aggregate): Option[LogicalPlan] = {
    val (table, filterOpt) = destructure(a.child).getOrElse(return None)
    val mv = LakeMv.forCorpus(table.tableDir).getOrElse(return None)
    val res = conf.resolver
    def isKey(name: String): Boolean = mv.keys.exists(res(_, name))

    // grouping: plain corpus columns, all of them view keys
    val groupNames = a.groupingExpressions.map {
      case ar: AttributeReference if isKey(ar.name) => ar.name
      case _                                        => return None
    }
    // filters: deterministic, key columns only — these commute with the
    // per-key aggregation and apply verbatim to state rows
    filterOpt.foreach { c =>
      if (!c.deterministic) return None
      if (c.exists(_.isInstanceOf[SubqueryExpression])) return None
      if (!c.references.forall(at => isKey(at.name))) return None
    }

    // every output expression must be a deterministic scalar shell over
    // grouping columns and DERIVABLE aggregate calls — `round(sum(v),2)`
    // and `sum(a)/count(*)` rewrite; `count(DISTINCT r)` declines
    if (a.aggregateExpressions.exists(!_.deterministic)) return None

    // EXPRESSION-NORMALIZED matching (the Calcite-class upgrade over
    // column identity): a registered source is any SQL expression, and
    // it matches the query's aggregate argument when both ANALYZED
    // trees agree modulo attribute ids. The registered source parses
    // and analyzes against the query child's own attributes, so type
    // coercion inserts the SAME casts on both sides (`value * qty`
    // over double×long carries cast(qty as double) in both trees);
    // comparison then replaces attribute references with their
    // lower-cased names and compares the rendered SQL — exact on
    // everything structural, deliberately NOT matching commuted forms
    // (`qty * value`), which stay on the corpus scan.
    val spark0 = SparkSession.active
    def normalize(e: Expression): String =
      e.transform {
        case ar: AttributeReference => UnresolvedAttribute.quoted(ar.name.toLowerCase)
      }.sql
    lazy val childAttrs = a.child.output
    // bound the cache: a long-lived session re-registering MVs against
    // evolving schemas accretes (source, schema) keys forever; entries
    // are tiny, so a generous cap + full reset is cheaper than LRU
    if (MvRewriteRule.srcCache.size > 1024) MvRewriteRule.srcCache.clear()
    def analyzedSrc(src: String): Option[Expression] =
      MvRewriteRule.srcCache.getOrElseUpdate(
        (src, childAttrs.map(at => (at.name, at.dataType)).toList), {
          scala.util.Try {
            val parsed = spark0.sessionState.sqlParser.parseExpression(src)
            val plan = spark0.sessionState.analyzer.execute(
              Project(Seq(Alias(parsed, "_mv_src")()), LocalRelation(childAttrs)))
            plan match {
              case Project(Seq(Alias(e, _)), _) if e.resolved => Some(e)
              case _                                          => None
            }
          }.toOption.flatten
        })
    def srcMatches(src: String, arg: Expression): Boolean = arg match {
      // fast path: bare column vs bare name, no parse needed
      case ar: AttributeReference if res(src, ar.name) => true
      case _ => analyzedSrc(src).exists(s => normalize(s) == normalize(arg))
    }
    def stateFor(op: String, arg: Expression): Option[String] =
      mv.aggs.collectFirst {
        case (stateCol, (o, src)) if o == op && src != "*" && srcMatches(src, arg) =>
          stateCol
      }
    def stateStar: Option[String] =
      mv.aggs.collectFirst { case (stateCol, ("count", "*")) => stateCol }
    // one re-aggregation over view state per aggregate call, cast back
    // to the call's own type (the re-aggregated type can out-grow it:
    // sum of a DECIMAL sum widens again; the value fits by construction,
    // it IS the original aggregate's value)
    def derive(ae: AggregateExpression): Option[org.apache.spark.sql.Column] = ae match {
      // exact count(DISTINCT c) from a ("distinct", c) value-set state:
      // the union of per-partial sets IS the group's value set (bounded
      // by the view's declared cap at maintenance time), so re-unioning
      // across state rows and sizing is exact at the view's grain AND
      // under rollup. Multi-arg count(DISTINCT a, b) stays declined.
      case AggregateExpression(Count(Seq(e)), Complete, true, None, _) =>
        stateFor("distinct", e).map { s =>
          import org.apache.spark.sql.functions.{array_distinct, collect_list, flatten, size}
          size(array_distinct(flatten(collect_list(col(s))))).cast(ae.dataType)
        }
      case AggregateExpression(fn, Complete, false, None, _) =>
        val c: Option[org.apache.spark.sql.Column] = fn match {
          case Sum(e, _) =>
            stateFor("sum", e).map(s => fsum(col(s)))
          case Count(Seq(Literal(v, _))) if v != null =>
            // count(*) / count(1): any non-null literal counts every row
            stateStar.map(s => fsum(col(s)))
          case Count(Seq(e)) =>
            stateFor("count", e).map(s => fsum(col(s)))
          case Min(e) =>
            stateFor("min", e).map(s => fmin(col(s)))
          case Max(e) =>
            stateFor("max", e).map(s => fmax(col(s)))
          case Average(e, _) =>
            for {
              sumC <- stateFor("sum", e)
              cntC <- stateFor("count", e)
            } yield fsum(col(sumC)) / fsum(col(cntC))
          // the sketch-native approximate distinct: union of the view's
          // per-delta sketches reaches the SAME register state as the
          // query's one-pass sketch (register-wise max is associative),
          // so hll_sketch_estimate(hll_sketch_agg(c)) answers EXACTLY
          // from ("hll", c) state. approx_count_distinct stays declined:
          // HLL++ is a different estimator — routing it would change the
          // answer, and this rule is a plan upgrade, never a semantics
          // trade. Non-default lgK declines too (state is sketched at
          // the Spark default; a coarser/finer query sketch differs).
          case h: HllSketchAgg if h.lgConfigK == 12 =>
            stateFor("hll", h.children.head).map(s =>
              org.apache.spark.sql.functions.hll_union_agg(col(s)))
          case _ => None
        }
        c.map(_.cast(ae.dataType))
      case _ => None
    }
    // distinct aggregate calls across ALL output expressions, derived up
    // front so a single underivable call declines the whole rewrite
    val calls = scala.collection.mutable.LinkedHashMap
      .empty[Expression, (String, org.apache.spark.sql.Column)]
    a.aggregateExpressions.foreach(_.foreach {
      case ae: AggregateExpression if !calls.contains(ae.canonicalized) =>
        val c = derive(ae).getOrElse(return None)
        calls.put(ae.canonicalized, (s"_mv_agg_${calls.size}", c)): Unit
      case _ =>
    })
    // non-aggregate references in the output can only be grouping
    // columns (analysis guarantees it; groupings are plain keys here)

    // freshness LAST: everything above is pure plan inspection; this
    // touches (memoized) table metadata. A fresh view serves alone; a
    // view stale behind pure appends serves COMBINED with a mechanical
    // aggregate of just the tail directories (LakeMv.readCombined) —
    // sync lag never forces the fact-table scan; anything else declines
    val spark = SparkSession.active

    rewriting.set(true)
    try {
      var df = LakeMv.readCombined(spark, mv).getOrElse(return None)
      filterOpt.foreach { c =>
        val rebound = c.transform {
          case ar: AttributeReference => UnresolvedAttribute.quoted(ar.name)
        }
        df = df.filter(Bridge.column(rebound))
      }
      val aggCols = calls.values.map { case (n, c) => c.as(n) }.toSeq
      val out =
        if (aggCols.isEmpty) df.select(groupNames.map(col): _*).distinct()
        else if (groupNames.isEmpty) df.agg(aggCols.head, aggCols.tail: _*)
        else df.groupBy(groupNames.map(col): _*).agg(aggCols.head, aggCols.tail: _*)
      val analyzed = Bridge.logicalPlan(out)
      def outAttr(name: String): Option[Attribute] =
        analyzed.output.filter(c => res(c.name, name)) match {
          case Seq(one) => Some(one)
          case _        => None
        }
      // rebuild each output expression over the replacement: aggregate
      // calls become their derived columns (transformDown, so the
      // attributes INSIDE a call are never touched), bare references
      // are grouping columns and bind to the view's keys by name —
      // everything re-aliased under the ORIGINAL exprId
      val rebuilt = a.aggregateExpressions.map { orig =>
        val body = orig match {
          case Alias(c, _) => c
          case other       => other
        }
        val sub = body.transformDown {
          case ae: AggregateExpression =>
            calls.get(ae.canonicalized).flatMap(n => outAttr(n._1)).getOrElse(return None)
          case ar: AttributeReference =>
            outAttr(ar.name).getOrElse(return None)
        }
        Alias(sub, orig.name)(exprId = orig.exprId, qualifier = orig.toAttribute.qualifier)
      }
      logInfo(s"MV rewrite: aggregate over ${table.tableDir} served by view ${mv.viewDir}")
      Some(Project(rebuilt, analyzed))
    } finally rewriting.set(false)
  }
}
