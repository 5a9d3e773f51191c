package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Alias, Attribute, EqualTo, Expression, GreaterThan, GreaterThanOrEqual,
  LessThan, LessThanOrEqual, Literal, RowNumber, SortOrder, WindowExpression}
import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite the ubiquitous per-key top-k idiom
  *
  * {{{ df.withColumn("rn", row_number().over(partitionBy(keys).orderBy(ord [desc], tie)))
  *      .filter($"rn" <= k) }}}
  *
  * by inserting [[PartialTopK]] BELOW the window, so each map partition
  * forwards at most k rows per key it sees instead of shuffling the whole
  * table — the declarative plan keeps its window semantics (the window
  * still sorts and ranks the survivors), the exchange just stops carrying
  * rows the filter was guaranteed to discard. This generalizes what
  * [[graft.operators.TopK.perKey]] does explicitly to ANY user query that
  * writes the plain window form.
  *
  * Deliberately narrow gates (each one is a correctness condition, not a
  * heuristic): exactly ONE window expression (another windowed agg over
  * the same spec needs the pruned rows); the function is `row_number`
  * (rank/dense_rank must retain boundary ties, a bounded heap cannot);
  * the order spec is exactly (ord, tie ASC) with both sides plain
  * non-nullable-tie attributes, ord of a double-exact numeric type (long
  * ords can exceed 2^53 — e.g. xxhash64 keys — and the heap compares
  * doubles) and tie integral (the heap's exact tiebreak); the filter
  * bound is a literal (a column bound like q_temperature_mix's per-group
  * quota has no static k). A conjunctive filter fires on its `rn <= k`
  * conjunct; the full filter still applies above. Idempotent for the
  * fixed-point optimizer batch via a child-already-pruned check.
  */
object TopKPushdown extends Rule[LogicalPlan] {

  private def staticK(e: Expression): Option[Int] = e match {
    case Literal(k: Int, IntegerType) => Some(k)
    case Literal(k: Long, LongType) if k <= Int.MaxValue => Some(k.toInt)
    case _ => None
  }

  /** k such that `cond` implies row_number <= k, from any conjunct. */
  private def impliedLimit(cond: Expression, rn: Attribute): Option[Int] = {
    val conjuncts = {
      def split(e: Expression): Seq[Expression] = e match {
        case org.apache.spark.sql.catalyst.expressions.And(l, r) => split(l) ++ split(r)
        case other => Seq(other)
      }
      split(cond)
    }
    conjuncts.flatMap {
      case LessThanOrEqual(a: Attribute, l) if a.semanticEquals(rn) => staticK(l)
      case LessThan(a: Attribute, l) if a.semanticEquals(rn) => staticK(l).map(_ - 1)
      case EqualTo(a: Attribute, l) if a.semanticEquals(rn) => staticK(l)
      case EqualTo(l, a: Attribute) if a.semanticEquals(rn) => staticK(l)
      case GreaterThanOrEqual(l, a: Attribute) if a.semanticEquals(rn) => staticK(l)
      case GreaterThan(l, a: Attribute) if a.semanticEquals(rn) => staticK(l).map(_ - 1)
      case _ => None
    }.reduceOption(math.min)
  }

  private def doubleExact(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | FloatType | DoubleType => true
    case _ => false // LongType deliberately out: 2^53 precision loss
  }

  private def integral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, w: Window)
        if w.windowExpressions.size == 1 &&
          !w.child.isInstanceOf[PartialTopK] =>
      val rewritten = for {
        alias <- Some(w.windowExpressions.head).collect { case a: Alias => a }
        we <- Some(alias.child).collect { case e: WindowExpression => e }
        _ <- Some(we.windowFunction).collect { case r: RowNumber => r }
        (ord, desc) <- w.orderSpec match {
          case Seq(SortOrder(o: Attribute, Descending, _, _), _) => Some((o, true))
          case Seq(SortOrder(o: Attribute, Ascending, _, _), _) => Some((o, false))
          case _ => None
        }
        tie <- w.orderSpec match {
          case Seq(_, SortOrder(t: Attribute, Ascending, _, _))
              if !t.nullable && integral(t.dataType) => Some(t)
          case _ => None
        }
        if doubleExact(ord.dataType)
        if w.partitionSpec.forall(_.isInstanceOf[Attribute])
        k <- impliedLimit(cond, alias.toAttribute)
        if k >= 1
      } yield f.copy(child = w.copy(child =
        PartialTopK(w.partitionSpec, ord, tie, desc, k, w.child)))
      rewritten.getOrElse(f)
  }
}
