package graft

import graft.functions.{BitmapAndCount, DotProduct, WordShingles}
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
  }
}
