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

  /** Per-GROUP exact discrete quantile, all groups bisected simultaneously:
    * each round is ONE job — rows join the (broadcast) per-group [lo, hi]
    * state, bin into a per-group histogram, and the driver narrows every
    * still-active group from the (groups × B)-row result. Same rank
    * semantics as [[quantileDisc]] (ceil(q·n), 1-indexed).
    *
    * This is the scale path q_winsorize's window formulation stands in
    * for: no per-group sort, no per-group value buffer — driver state is
    * O(groups × B) per round and the final collect is ≤ collectAt rows per
    * group. Suited to group counts up to the thousands (dashboards,
    * statuses, languages); per-KEY quantiles at millions of groups want
    * the sketch/window forms instead.
    */
  def quantileDiscByGroup(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      q: Double,
      collectAt: Long = 65536L): Map[String, Double] = {
    require(q > 0.0 && q <= 1.0, s"q must be in (0, 1], got $q")
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df
      .select(col(groupCol).cast("string").as("g"), col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
      .cache()

    final case class St(lo: Double, hi: Double, k: Long, remaining: Long)
    var state: Map[String, St] = vals
      .groupBy("g")
      .agg(count(lit(1)).as("n"), min("v").as("lo"), max("v").as("hi"))
      .collect()
      .map { r =>
        val n = r.getLong(1)
        val k = math.ceil(
          (BigDecimal(q) * BigDecimal(n))
            .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble).toLong
        r.getString(0) -> St(r.getDouble(2), r.getDouble(3), k, n)
      }
      .toMap
    val done = scala.collection.mutable.Map.empty[String, Double]
    var rounds = 0
    while (state.nonEmpty && rounds < 64) {
      // settle groups that converged or are small enough for the tail pass
      val (finish, continue) = state.partition { case (_, s) =>
        s.lo == s.hi || s.remaining <= collectAt || (s.hi - s.lo) / Bins == 0.0
      }
      val (trivial, tails) = finish.partition { case (_, s) => s.lo == s.hi }
      trivial.foreach { case (g, s) => done(g) = s.lo }
      if (tails.nonEmpty) {
        // ONE batched tail pass for every finishing group
        val b = tails.toSeq.map { case (g, s) => (g, s.lo, s.hi) }.toDF("g", "lo", "hi")
        val collected = vals
          .join(broadcast(b), "g")
          .filter(col("v") >= col("lo") && col("v") <= col("hi"))
          .select("g", "v")
          .collect()
          .map(r => (r.getString(0), r.getDouble(1)))
          .groupBy(_._1)
        tails.foreach { case (g, s) =>
          val sorted = collected(g).map(_._2).sorted
          done(g) = sorted(s.k.toInt - 1)
        }
      }
      state = continue
      if (state.nonEmpty) {
        val bounds = state.toSeq
          .map { case (g, s) => (g, s.lo, s.hi, (s.hi - s.lo) / Bins) }
          .toDF("g", "lo", "hi", "w")
        val hist = vals
          .join(broadcast(bounds), "g")
          .filter(col("v") >= col("lo") && col("v") <= col("hi"))
          .groupBy(col("g"), least(floor((col("v") - col("lo")) / col("w")), lit(Bins - 1L)).as("b"))
          .agg(count(lit(1)).as("c"))
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
          .groupBy(_._1)
        state = state.map { case (g, s) =>
          val binned = hist(g).map(t => (t._2, t._3)).sortBy(_._1)
          val width = (s.hi - s.lo) / Bins
          var acc = 0L
          var idx = 0
          while (acc + binned(idx)._2 < s.k) { acc += binned(idx)._2; idx += 1 }
          val (b, c) = binned(idx)
          val lo = s.lo + b * width
          val hi = if (b == Bins - 1L) s.hi else lo + width
          g -> St(lo, hi, s.k - acc, c)
        }
      }
      rounds += 1
    }
    vals.unpersist(blocking = false)
    require(state.isEmpty, s"quantile bisection did not converge for ${state.keys}")
    done.toMap
  }
}
