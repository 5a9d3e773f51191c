package graft.plans

import graft.functions.WordTokens
import graft.sources.{LakeTable, TextIndexes, VersionedLake}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.graft.Bridge

/** AUTOMATIC BM25 ROUTING onto a persisted inverted text index — the
  * [[MvRewriteRule]] bargain applied to retrieval: the canonical
  * scan-shaped BM25 aggregate (tokenize the corpus, filter to the query
  * terms, score tf·idf with per-document length normalization, sum
  * per-term contributions) re-plans as [[graft.operators.InvertedIndex.searchBm25]]
  * over the registered index whenever the plan provably computes that
  * exact function over that exact corpus. At 100 TB the substitution
  * replaces a full-corpus tokenization with a read of ≤|terms| postings
  * hash buckets — and the index answers bit-identically (same formula,
  * same per-term round(·,9) → sum → round(·,6) discipline), so the
  * rewrite changes WHERE the work happens, never the answer.
  *
  * What must hold before the route fires (all checked on the plan, in
  * cheap-first order):
  *
  *  - the aggregate is `GROUP BY <doc>` producing exactly the doc key
  *    and `round(sum(<contrib>), 6)`, with `<contrib>` an alias of
  *    `round(<formula>, 9)` below;
  *  - every LEAF under the aggregate reads the SAME registered corpus
  *    (a lake table dir or a parquet root in [[TextIndexes]]) — a join
  *    against anything else declines;
  *  - the subtree contains ONLY the canonical shape's node kinds
  *    (project/filter/join/generate/aggregate/alias/hint) — a Limit, a
  *    Sample, a Union would have its semantics silently discarded by the
  *    whole-subtree splice;
  *  - the subtree tokenizes ONLY the registered text column through the
  *    native [[WordTokens]] expression; EVERY filter conjunct is either
  *    the token-set membership on a TOKEN attribute (traced from the
  *    explode's generator output through bare aliases) or its null
  *    guard, and all membership sets agree — one extra predicate (a
  *    doc-id range, a language allow-list) declines, because the probe
  *    could not honor it and dropping it would answer a different query;
  *  - the doc key is the registered id column;
  *  - `<formula>` is EXACTLY the BM25 contribution for some (k1, b):
  *    candidate constants are read off the formula's own double
  *    literals, the expected tree is re-parsed and re-analyzed against
  *    the formula's own attributes (coercion casts land identically),
  *    and the two trees must agree modulo attribute ids.
  *    Structural variants (commuted factors, a different log base)
  *    stay on the corpus scan — the rule is a strict plan upgrade,
  *    never a semantics guess;
  *  - for a LAKE corpus, the index's sync watermark equals the corpus's
  *    current version (a stale index never serves — the
  *    [[graft.sources.LakeMv]] freshness contract). Plain-path corpora
  *    are immutable by registration contract.
  */
object Bm25AutoRoute extends Rule[LogicalPlan] {

  private val rewriting = new ThreadLocal[Boolean] {
    override def initialValue(): Boolean = false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (TextIndexes.isEmpty || rewriting.get()) plan
    else plan.transformUpWithSubqueries {
      case a: Aggregate if a.resolved => tryRewrite(a).getOrElse(a)
    }

  private def tryRewrite(a: Aggregate): Option[LogicalPlan] = {
    // ---- shape: GROUP BY doc → (doc, round(sum(contrib), 6)) ----
    val docAttr = a.groupingExpressions match {
      case Seq(ar: AttributeReference) => ar
      case _                           => return None
    }
    val (docOut, scoreAlias, contribRef) = a.aggregateExpressions match {
      case Seq(d: AttributeReference,
          al @ Alias(Round(ae: AggregateExpression, Literal(6, _), _), _))
          if d.exprId == docAttr.exprId =>
        ae match {
          case AggregateExpression(Sum(cRef: AttributeReference, _), Complete, false, None, _) =>
            (d, al, cRef)
          case _ => return None
        }
      case _ => return None
    }
    // ---- contrib: an alias of round(formula, 9) somewhere below ----
    val formula = a.child.collect {
      case p: Project =>
        p.projectList.collect {
          case al @ Alias(Round(f, Literal(9, _), _), _)
              if al.exprId == contribRef.exprId => f
        }
    }.flatten.headOption.getOrElse(return None)

    // ---- one registered corpus under every leaf ----
    val leafKeys = a.child.collectLeaves().map {
      case lr: LogicalRelation =>
        lr.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation
              if h.location.rootPaths.length == 1 =>
            h.location.rootPaths.head.toUri.getPath
          case _ => return None
        }
      case r: DataSourceV2Relation =>
        r.table match {
          case t: LakeTable if t.pinnedVersion.isEmpty => t.tableDir
          case _                                       => return None
        }
      case _ => return None
    }
    val corpusKey = leafKeys.headOption.getOrElse(return None)
    val entry = TextIndexes.lookup(corpusKey).getOrElse(return None)
    if (!leafKeys.forall(k => TextIndexes.lookup(k).contains(entry))) return None
    val res = conf.resolver
    if (!res(docAttr.name, entry.idCol)) return None

    // ---- the subtree may contain ONLY the canonical shape's node kinds.
    // The rewrite REPLACES the whole subtree, so any node that can drop,
    // duplicate, or reorder rows beyond that shape (Limit, Sample, Union,
    // Window, ...) would have its semantics silently discarded — decline.
    var badNode = false
    a.child.foreach {
      case _: Project | _: Filter | _: Join | _: Generate | _: Aggregate |
          _: SubqueryAlias | _: ResolvedHint => ()
      case leaf if leaf.children.isEmpty => () // leaves were validated above
      case _ => badNode = true
    }
    if (badNode) return None

    // ---- tokenization and the query-term filters ----
    var tokenizedOther = false
    a.child.foreach { n =>
      n.expressions.foreach(_.foreach {
        case WordTokens(ar: AttributeReference) if res(ar.name, entry.textCol) => ()
        case WordTokens(_) => tokenizedOther = true
        case _ => ()
      })
    }
    if (tokenizedOther) return None
    // attributes that ARE tokens of the registered text column: the
    // generator outputs of explode(word_tokens(text)), followed through
    // bare-alias projections to a fixpoint
    val tokenIds = scala.collection.mutable.Set.empty[ExprId]
    a.child.foreach {
      case g: Generate => g.generator match {
        case Explode(WordTokens(ar: AttributeReference)) if res(ar.name, entry.textCol) =>
          g.generatorOutput.foreach(o => tokenIds += o.exprId)
        case _ => ()
      }
      case _ => ()
    }
    var grew = tokenIds.nonEmpty
    while (grew) {
      grew = false
      a.child.foreach {
        case p: Project => p.projectList.foreach {
          case al @ Alias(ar: AttributeReference, _)
              if tokenIds.contains(ar.exprId) && !tokenIds.contains(al.exprId) =>
            tokenIds += al.exprId; grew = true
          case _ => ()
        }
        case _ => ()
      }
    }
    // EVERY filter conjunct must be accounted for: the membership test on
    // a TOKEN attribute (the query terms) or its null guard. Anything
    // else — a doc-id range, a language allow-list, a NOT(IN ...) — is a
    // predicate the index probe cannot honor, and dropping it would
    // answer a DIFFERENT query over the whole corpus. Decline.
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case x         => Seq(x)
    }
    val termSets = scala.collection.mutable.ListBuffer.empty[Seq[String]]
    var badFilter = false
    a.child.foreach {
      case Filter(cond, _) =>
        conjuncts(cond).foreach {
          case In(ar: AttributeReference, vs) if tokenIds.contains(ar.exprId) &&
            vs.nonEmpty &&
            vs.forall { case Literal(s, org.apache.spark.sql.types.StringType) => s != null
                        case _ => false } =>
            termSets += vs.map(_.asInstanceOf[Literal].value.toString)
          case IsNotNull(ar: AttributeReference) if tokenIds.contains(ar.exprId) => ()
          case _ => badFilter = true
        }
      case _ => ()
    }
    if (badFilter) return None
    val terms = termSets.toList match {
      case sets @ (first :: _) if sets.forall(_ == first) => first
      case _                                              => return None
    }

    // ---- the formula is the exact BM25 contribution for some (k1, b) ----
    val names = formula.references.map(_.name.toLowerCase).toSet
    if (names != Set("n", "df", "tf", "len", "avgl")) return None
    def normalize(e: Expression): String =
      e.transform {
        case ar: AttributeReference => UnresolvedAttribute.quoted(ar.name.toLowerCase)
      }.sql
    val spark = SparkSession.active
    val attrs = formula.references.toSeq
    val doubles = formula.collect {
      case Literal(d: Double, org.apache.spark.sql.types.DoubleType) => d
    }.distinct
    // the template re-parses and re-analyzes against the formula's OWN
    // attributes, so coercion inserts identical casts; double literals
    // render through Literal.sql (Double.toString round-trips exactly),
    // so (k1 + 1) carries the same bits the scan query computed
    def expected(k1: Double, b: Double): Option[String] =
      scala.util.Try {
        def d(v: Double) = Literal(v).sql
        val tmpl =
          s"ln((n - df + ${d(0.5)}) / (df + ${d(0.5)}) + ${d(1.0)}) * " +
            s"(tf * ${d(k1 + 1)}) / " +
            s"(tf + ${d(k1)} * (${d(1 - b)} + ${d(b)} * len / avgl))"
        val parsed = spark.sessionState.sqlParser.parseExpression(tmpl)
        val analyzed = spark.sessionState.analyzer.execute(
          Project(Seq(Alias(parsed, "_bm")()), LocalRelation(attrs)))
        analyzed match {
          case Project(Seq(Alias(e, _)), _) if e.resolved => Some(normalize(e))
          case _                                          => None
        }
      }.toOption.flatten
    val target = normalize(formula)
    val params = (for {
      k1 <- doubles; b <- doubles
      if expected(k1, b).contains(target)
    } yield (k1, b)).headOption.getOrElse(return None)

    // ---- freshness (lake corpora only; metadata-only reads) ----
    if (entry.lakeCorpus) {
      val postDir = graft.operators.InvertedIndex.postingsDir(entry.indexDir)
      val fresh = for {
        corpusV <- VersionedLake.currentVersion(spark, corpusKey)
        postV <- VersionedLake.currentVersion(spark, postDir)
        wm <- VersionedLake.txnWatermarks(spark, postDir, postV)
          .get(graft.operators.InvertedIndex.SyncApp)
      } yield wm == corpusV
      if (!fresh.contains(true)) return None
    }

    // ---- splice the index probe under the original output ids ----
    rewriting.set(true)
    try {
      val df = graft.operators.InvertedIndex.searchBm25(
        spark, entry.indexDir, terms, k = None, k1 = params._1, b = params._2)
      val analyzed = Bridge.logicalPlan(df)
      val docView = analyzed.output.find(_.name == "doc_id").getOrElse(return None)
      val bmView = analyzed.output.find(_.name == "bm25").getOrElse(return None)
      logInfo(s"BM25 route: scan-shaped query over $corpusKey served by " +
        s"index ${entry.indexDir} (terms=${terms.mkString(",")})")
      Some(Project(Seq(
        Alias(docView, docOut.name)(exprId = docOut.exprId,
          qualifier = docOut.qualifier),
        Alias(
          if (bmView.dataType == scoreAlias.dataType) bmView
          else Cast(bmView, scoreAlias.dataType),
          scoreAlias.name)(
          exprId = scoreAlias.exprId,
          qualifier = scoreAlias.toAttribute.qualifier)),
        analyzed))
    } finally rewriting.set(false)
  }
}
