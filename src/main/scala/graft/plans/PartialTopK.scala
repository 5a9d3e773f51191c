package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Map-side per-key top-k pruning — the whole-operator custom-plan path
  * (LogicalPlan + Strategy + SparkPlan via SparkSessionExtensions).
  *
  * `row_number() OVER (PARTITION BY key ORDER BY ord) <= k` shuffles the
  * ENTIRE table, then discards all but k rows per key after the exchange.
  * Spark 3.5+ mitigates with WindowGroupLimit, whose Partial mode prunes
  * before the exchange — but it REQUIRES sorted input, so the plan still
  * fully sorts every map partition of the big table first. This node sits
  * below even that: a hash map of bounded heaps over UNSORTED input —
  * O(n log k) per partition instead of the O(n log n) sort — emitting at
  * most k·(distinct keys in the partition) rows. The sort and window above
  * then operate on the tiny survivor set only: same result, no big sort,
  * fraction of the shuffle.
  *
  * Correctness requires a TOTAL order, so the operator takes an explicit
  * unique numeric `tie` expression alongside `ord` — otherwise boundary
  * ties would be dropped arbitrarily per partition and the surviving set
  * could differ from what the full window would rank first.
  */
case class PartialTopK(
    keys: Seq[Expression],
    ord: Expression,
    tie: Expression,
    descending: Boolean,
    k: Int,
    child: LogicalPlan) extends UnaryNode {

  require(k >= 1, s"k must be >= 1, got $k")

  override def output: Seq[Attribute] = child.output

  override def maxRows: Option[Long] = child.maxRows

  override protected def withNewChildInternal(newChild: LogicalPlan): PartialTopK =
    copy(child = newChild)
}

/** Physical implementation: one pass over each partition with a hash map
  * of size-k heaps keyed on the grouping columns. No exchange, no sort;
  * preserves the child's partitioning and ordering guarantees are not
  * claimed (heap emission order is unspecified — the window above sorts).
  */
case class PartialTopKExec(
    keys: Seq[Expression],
    ord: Expression,
    tie: Expression,
    descending: Boolean,
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val ordExpr = ord
    val tieExpr = tie
    val desc = descending
    val kk = k
    val childOutput = child.output
    child.execute().mapPartitions ({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val boundOrd = BindReferences.bindReference(ordExpr, childOutput)
      val boundTie = BindReferences.bindReference(tieExpr, childOutput)
      // per key: a size<=kk min-heap (for desc) over (ord, tie); the head
      // is the currently-worst retained row, evicted on a better arrival
      final case class Entry(o: Double, t: Long, row: InternalRow)
      // "goodness" order, mirroring the window above EXACTLY: ord in the
      // requested direction, then SMALLER tie wins in BOTH directions —
      // the window is ORDER BY ord [DESC], tie ASC, so on an ord tie at
      // the retention boundary the window ranks the smallest ties first.
      // (A same-direction (ord, tie) tuple order looked equivalent but
      // retained the LARGEST ties of an equal-ord group — wrong rows.)
      val entryOrd: Ordering[Entry] = new Ordering[Entry] {
        override def compare(a: Entry, b: Entry): Int = {
          val c = java.lang.Double.compare(a.o, b.o)
          val oc = if (desc) c else -c
          if (oc != 0) oc else java.lang.Long.compare(b.t, a.t)
        }
      }
      val heaps = new java.util.HashMap[InternalRow, scala.collection.mutable.PriorityQueue[Entry]]()
      // Rows whose ord is null/NaN cannot be ranked here (the window above
      // orders them by its own null/NaN placement) — they PASS THROUGH
      // unpruned, lazily, so they are never buffered. Prunable rows go into
      // the per-key heaps, emitted once the partition is exhausted.
      new Iterator[InternalRow] {
        private var pending: InternalRow = _
        private var drained = false
        private var heapIt: Iterator[Entry] = Iterator.empty
        private var heapsIt: java.util.Iterator[scala.collection.mutable.PriorityQueue[Entry]] = _

        @scala.annotation.tailrec
        private def advance(): Unit = {
          if (pending != null || drained) return
          if (!iter.hasNext) {
            drained = true
            heapsIt = heaps.values().iterator()
            return
          }
          val row = iter.next()
          val raw = boundOrd.eval(row)
          val o = raw match {
            case null => Double.NaN
            case n: java.lang.Number => n.doubleValue()
            case other => other.asInstanceOf[Double]
          }
          if (o.isNaN) { pending = row; return }
          val t = boundTie.eval(row).asInstanceOf[java.lang.Number].longValue()
          val key = keyProj.apply(row).copy()
          var heap = heaps.get(key)
          if (heap == null) {
            // PriorityQueue dequeues the MAX of its ordering; reverse so the
            // dequeued element is the worst retained entry
            heap = scala.collection.mutable.PriorityQueue.empty(entryOrd.reverse)
            heaps.put(key, heap)
          }
          if (heap.size < kk) heap.enqueue(Entry(o, t, row.copy()))
          else if (entryOrd.compare(Entry(o, t, null), heap.head) > 0) {
            heap.dequeue()
            heap.enqueue(Entry(o, t, row.copy()))
          }
          advance()
        }

        override def hasNext: Boolean = {
          advance()
          if (pending != null) true
          else {
            while (!heapIt.hasNext && heapsIt != null && heapsIt.hasNext)
              heapIt = heapsIt.next().iterator
            heapIt.hasNext
          }
        }

        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          if (pending != null) { val r = pending; pending = null; r }
          else heapIt.next().row
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): PartialTopKExec =
    copy(child = newChild)
}

/** Planner strategy mapping the logical node to its exec. */
object PartialTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case PartialTopK(keys, ord, tie, desc, k, child) =>
      PartialTopKExec(keys, ord, tie, desc, k, planLater(child)) :: Nil
    case _ => Nil
  }
}
