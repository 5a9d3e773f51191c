package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact discrete quantiles of a numeric column with NO global sort and
  * NO driver-side value collection proportional to n — the "exact median
  * of 100 TB" operator.
  *
  * Spark's own exact `percentile` aggregate buffers every distinct value
  * per group in memory (fine for small groups, fatal for a whole-table
  * quantile at scale); `approx_percentile` is approximate. This operator
  * instead runs histogram bisection:
  *
  *   1. one pass: (count, min, max);
  *   2. repeated passes: a B-bin equal-width histogram over the current
  *      [lo, hi] (a groupBy on a computed bin index — B rows out), after
  *      which the driver locates the bin containing the target rank and
  *      narrows to it;
  *   3. once the candidate bin holds few enough rows, one final filtered
  *      pass collects just that bin and picks the rank-th element.
  *
  * Each pass is a full-parallel scan with a B-row result; convergence is
  * geometric (factor B per round), so a 100 TB column takes ~3 histogram
  * rounds at B=4096. Rank semantics match DuckDB `quantile_disc`:
  * k = ceil(q·n), 1-indexed over the sorted column.
  */
object ExactQuantile {

  private val Bins = 4096

  /** Exact q-th discrete quantile of `df`'s `valueCol` (nulls ignored).
    * `collectAt` is the final-pass collect threshold in rows — bins are
    * bisected until the candidate bin is at most this big (tests shrink it
    * to force multi-round narrowing).
    */
  def quantileDisc(
      df: DataFrame,
      valueCol: String,
      q: Double,
      collectAt: Long = 65536L): Double = {
    val CollectAt = collectAt
    require(q > 0.0 && q <= 1.0, s"q must be in (0, 1], got $q")
    val vals = df.select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
    val head = vals.agg(
      count(lit(1)).as("n"), min("v").as("lo"), max("v").as("hi")).head()
    val n = head.getLong(0)
    require(n > 0, s"no non-null values in $valueCol")
    var lo = head.getDouble(1)
    var hi = head.getDouble(2)
    // ceil(q*n) robust to the FP product landing just above an exact integer
    var k = math.ceil(
      (BigDecimal(q) * BigDecimal(n))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble).toLong
    var remaining = n
    var widthOk = true
    while (lo < hi && remaining > CollectAt && widthOk) {
      val width = (hi - lo) / Bins
      // bin index clamped so v == hi lands in the last bin
      if (width == 0.0) { widthOk = false }
      else {
      val binned = vals
        .filter(col("v") >= lo && col("v") <= hi)
        .groupBy(least(floor((col("v") - lo) / width), lit(Bins - 1L)).as("b"))
        .agg(count(lit(1)).as("c"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .sortBy(_._1)
      var acc = 0L
      var idx = 0
      while (acc + binned(idx)._2 < k) { acc += binned(idx)._2; idx += 1 }
      val (b, c) = binned(idx)
      k -= acc
      remaining = c
      lo = lo + b * width
      hi = if (b == Bins - 1L) hi else lo + width
      }
    }
    if (lo == hi) lo
    else {
      val tail = vals.filter(col("v") >= lo && col("v") <= hi)
        .collect().map(_.getDouble(0)).sorted
      tail(k.toInt - 1)
    }
  }
}
