package graft

import graft.functions.{BitmapAndCount, DotProduct, NfcNormalize, WinnowFingerprintsExpr, WordShingles, WordShinglesAll, WordTokens}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook: registers the engine's native expressions
  * with the SQL function registry, so `spark.sql("... dot_product(a, b)")`
  * works alongside the Column API, and installs the optimizer rule that
  * rewrites the portable HOF dot-product shape into the codegen'd kernel
  * ([[graft.plans.NativeKernelRules]])
  * (`spark.sql.extensions=graft.GraftExtensions`, set by
  * graft.engine.Session.builder).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectResolutionRule(_ => graft.plans.LakeDmlRules)
    ext.injectResolutionRule(_ => graft.plans.LakeReadThroughRule)
    // identifier spelling for the retrieval TVFs' corpus argument
    ext.injectResolutionRule(_ => graft.plans.TextSearchTvf.IdentifierArgRule)
    // post-hoc (after full resolution, Once): aggregate-over-corpus
    // shapes are only recognizable on a resolved tree, and the rewrite
    // splices an already-analyzed replacement — nothing left to resolve
    ext.injectPostHocResolutionRule(_ => graft.plans.MvRewriteRule)
    ext.injectPostHocResolutionRule(_ => graft.plans.Bm25AutoRoute)
    ext.injectOptimizerRule(_ => graft.plans.NativeKernelRules)
    ext.injectOptimizerRule(_ => graft.plans.TopKPushdown)
    ext.injectPlannerStrategy(_ => graft.plans.PartialTopKStrategy)
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("bitmap_and_count"),
      new ExpressionInfo(classOf[BitmapAndCount].getName, "bitmap_and_count"),
      (children: Seq[Expression]) => BitmapAndCount(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (children: Seq[Expression]) =>
        WordShingles(children(0), children(1).eval().asInstanceOf[Number].intValue())))
    // the rest of the native text kernels, so the full surface is
    // reachable from pure SQL (a `spark.sql` user sees the same engine
    // as a Column-API user)
    ext.injectFunction((
      FunctionIdentifier("word_shingles_all"),
      new ExpressionInfo(classOf[WordShinglesAll].getName, "word_shingles_all"),
      (children: Seq[Expression]) =>
        WordShinglesAll(children(0), children(1).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((
      FunctionIdentifier("word_tokens"),
      new ExpressionInfo(classOf[WordTokens].getName, "word_tokens"),
      (children: Seq[Expression]) => WordTokens(children(0))))
    ext.injectFunction((
      FunctionIdentifier("winnow_fingerprints"),
      new ExpressionInfo(classOf[WinnowFingerprintsExpr].getName, "winnow_fingerprints"),
      (children: Seq[Expression]) =>
        WinnowFingerprintsExpr(
          children(0),
          children(1).eval().asInstanceOf[Number].intValue(),
          children(2).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (children: Seq[Expression]) => NfcNormalize(children(0))))
    // positional retrieval as TABLE functions — `SELECT * FROM
    // phrase_search('corpus', 'exact phrase')` reads ≤|terms| postings
    // buckets of the registered index, never the corpus (see
    // graft.plans.TextSearchTvf for the freshness contract)
    ext.injectTableFunction((
      FunctionIdentifier("phrase_search"),
      new ExpressionInfo(graft.plans.TextSearchTvf.getClass.getName, "phrase_search"),
      (children: Seq[Expression]) => graft.plans.TextSearchTvf.phrasePlan(children)))
    ext.injectTableFunction((
      FunctionIdentifier("near_search"),
      new ExpressionInfo(graft.plans.TextSearchTvf.getClass.getName, "near_search"),
      (children: Seq[Expression]) => graft.plans.TextSearchTvf.nearPlan(children)))
  }
}
