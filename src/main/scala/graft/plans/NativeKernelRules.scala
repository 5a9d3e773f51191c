package graft.plans

import graft.functions.DotProduct
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the portable higher-order-function dot product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x) }}}
  *
  * into the engine's codegen'd [[DotProduct]] kernel. Higher-order
  * functions are CodegenFallback in Spark — evaluated interpreted, per
  * element, breaking the surrounding whole-stage-codegen span — so a user
  * who writes the portable SQL shape pays ~5-10× on the hot path. With
  * this rule (installed by [[graft.GraftExtensions]]) the declarative form
  * optimizes itself: same semantics for non-null elements (the kernel
  * treats the arrays as dense vectors, the assumption every vector column
  * in this engine already makes), native speed.
  *
  * The match is deliberately exact: double-typed arrays, a multiply lambda
  * over precisely the two zipped slots (either order), a fold that adds
  * precisely the accumulator and the element, a 0.0 literal zero and an
  * identity finish. Anything else is left untouched.
  */
object NativeKernelRules extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b, LambdaFunction(m: Multiply, Seq(x, y), _)),
            zero,
            LambdaFunction(ad: Add, Seq(acc, el), _),
            finish)
          if isDoubleArray(a) && isDoubleArray(b) &&
            isZeroDouble(zero) &&
            isPair(m.left, m.right, x, y) &&
            isPair(ad.left, ad.right, acc, el) &&
            isIdentity(finish) =>
        DotProduct(a, b)
    }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def isZeroDouble(e: Expression): Boolean = e match {
    case Literal(0.0d, DoubleType) => true
    case _ => false
  }

  /** l and r are exactly the two lambda slots, in either order. */
  private def isPair(
      l: Expression,
      r: Expression,
      s1: NamedExpression,
      s2: NamedExpression): Boolean =
    (l.semanticEquals(s1) && r.semanticEquals(s2)) ||
      (l.semanticEquals(s2) && r.semanticEquals(s1))

  private def isIdentity(e: Expression): Boolean = e match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
      v.exprId == a.exprId
    case _ => false
  }
}
