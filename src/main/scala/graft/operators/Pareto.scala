package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable 2-D Pareto front (skyline): the distinct points (x, y) not
  * dominated by any other point — dominance being x' >= x AND y' >= y with
  * (x', y') != (x, y), i.e. both dimensions maximized.
  *
  * The textbook single-pass algorithm (sort by x desc, keep points whose y
  * exceeds the running max) needs a GLOBAL running max — as a window
  * function that's `ORDER BY x DESC` with no PARTITION BY, a
  * single-partition stage that cannot survive 100 TB. Same cure as
  * [[GlobalRank]]: range-partition on the sort key so partitions tile the
  * sort order, then
  *
  *   1. one tiny agg computes each partition's max(y);
  *   2. the driver prefix-maxes those into "best y strictly before this
  *      partition" (a per-partition scalar, broadcast back);
  *   3. a within-partition running max (a REAL partitionBy window — no
  *      single-node stage) combines with the broadcast prefix, and a
  *      point survives iff y > greatest(prefix, within-partition max).
  *
  * The data shuffles twice (distinct, range exchange) and never sorts
  * globally; every stage is partition-parallel.
  */
object Pareto {

  /** Skyline of the distinct (`x`, `y`) points of `df`, maximizing both.
    * Output columns: `x`, `y`.
    *
    * Two-phase: each partition first reduces to its LOCAL skyline in
    * memory (any global-front point is on its partition's front, so this
    * loses nothing) — the exchange then carries only local-front points,
    * typically orders of magnitude fewer than the input. The exact global
    * pass below runs on that residue.
    */
  def front2D(df: DataFrame): DataFrame = {
    val spark0 = df.sparkSession
    import spark0.implicits._
    val local = df
      .select(col("x").cast("double"), col("y").cast("double"))
      .filter(col("x").isNotNull && col("y").isNotNull)
      .as[(Double, Double)]
      .mapPartitions { it =>
        val pts = it.toArray
        // sort x desc, y desc; keep strictly-rising y = local front
        java.util.Arrays.sort(pts, Ordering.Tuple2(
          Ordering.Double.TotalOrdering.reverse, Ordering.Double.TotalOrdering.reverse))
        var best = Double.NegativeInfinity
        pts.iterator.filter { case (_, y) =>
          if (y > best) { best = y; true } else false
        }
      }
      .toDF("x", "y")
    val d = local
      .distinct()
    val sorted = d
      .repartitionByRange(col("x").desc, col("y").desc)
      .sortWithinPartitions(col("x").desc, col("y").desc)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    val partMax = sorted
      .groupBy("_pid")
      .agg(max("y").as("_pmax"))
      .collect()
      .map(r => (r.getInt(0), r.getDouble(1)))
      .sortBy(_._1)
    // prefix max over strictly-preceding partitions (sort order tiles pids)
    val prefixes = partMax
      .scanLeft((0, Double.NegativeInfinity, Double.NegativeInfinity)) {
        case ((_, acc, _), (pid, m)) => (pid, math.max(acc, m), acc)
      }
      .drop(1)
      .map { case (pid, _, before) => (pid, before) }
    val offDf = prefixes.toSeq.toDF("_pid", "_before")
    val win = Window
      .partitionBy("_pid")
      .orderBy(col("x").desc, col("y").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    sorted
      .join(broadcast(offDf), "_pid")
      .withColumn("_run", coalesce(max("y").over(win), lit(Double.NegativeInfinity)))
      .filter(col("y") > greatest(col("_run"), col("_before")))
      .select(col("x"), col("y"))
  }
}
