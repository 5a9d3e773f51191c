package graft.sources

import org.apache.spark.sql.SparkSession

import scala.collection.concurrent.TrieMap

/** Registry of materialized views eligible for AUTOMATIC QUERY REWRITE
  * ([[graft.plans.MvRewriteRule]]): a registered view tells the planner
  * "this [[LakeView]] state table holds `aggs` grouped by `keys` over
  * the corpus at `corpusDir`" — enough to answer any aggregate query
  * whose grouping keys are a subset of `keys` and whose aggregates
  * derive from the stored state, by reading O(groups) view rows instead
  * of the corpus. At 100 TB this is the decisive rewrite: a dashboard
  * rollup over a fact table costs the view's group count, not the
  * table, and the view itself is maintained at O(delta) per commit by
  * [[LakeView.sync]].
  *
  * The registration is a CLAIM the caller owns: `aggs` must be exactly
  * the aggregations `stateOf` computed (same source columns, same
  * grouping), or the rewrite would answer with someone else's numbers.
  * The rule itself guards everything it can check: key subset, state
  * availability per aggregate, deterministic key-only filters, and
  * FRESHNESS — a view whose sync watermark is behind the corpus's
  * current version is skipped entirely, so a stale view can never serve
  * a query (the steady state is "sync then query", same as any
  * lakehouse MV).
  *
  * Scope mirrors classic aggregate-MV rewriting (Calcite/Oracle
  * "query rewrite", materialized Delta/BigQuery BI engines): matching
  * is by table identity + column names, not expression equivalence.
  */
object LakeMv {

  /** op ∈ sum|count|min|max; count's source column is "*" (count(*) /
    * count(1) at registration time). A query's avg(c) is served when
    * BOTH (sum, c) and (count, c) state columns exist.
    */
  final case class MvDef(
      corpusDir: String,
      viewDir: String,
      keys: Seq[String],
      aggs: Map[String, (String, String)],
      liveness: Option[String] = None) {
    require(aggs.nonEmpty, "an MV registration needs at least one aggregate")
    val mergeSpec: Seq[(String, String)] =
      aggs.toSeq.sortBy(_._1).map {
        case (c, ("count", _)) => c -> "sum" // counts merge by summing
        case (c, (op, _))      => c -> op
      }
  }

  private val registry = TrieMap.empty[String, MvDef]

  private def norm(dir: String): String = dir.stripSuffix("/")

  def register(mv: MvDef): Unit =
    registry.put(norm(mv.corpusDir), mv.copy(corpusDir = norm(mv.corpusDir))): Unit

  def drop(corpusDir: String): Unit = registry.remove(norm(corpusDir)): Unit

  def clear(): Unit = registry.clear()

  def isEmpty: Boolean = registry.isEmpty

  def forCorpus(corpusDir: String): Option[MvDef] = registry.get(norm(corpusDir))

  /** A view serves queries only while it reflects the corpus's CURRENT
    * version — both sides are memoized manifest reads, so the check is
    * metadata-only and safe to run per query plan.
    */
  def fresh(spark: SparkSession, mv: MvDef): Boolean = {
    val corpusV = VersionedLake.currentVersion(spark, mv.corpusDir)
    corpusV.nonEmpty && LakeView.watermark(spark, mv.viewDir) == corpusV
  }
}
