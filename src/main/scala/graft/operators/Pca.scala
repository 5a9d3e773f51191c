package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Top principal direction of an embedding column via distributed Gram
  * accumulation + driver-side power iteration.
  *
  * The scale split mirrors IVF/PQ training: the DATA pass is distributed —
  * a custom [[Aggregator]] accumulates the d×d Gram matrix Σ v·vᵀ with
  * map-side partial aggregation, so the one shuffle carries a d² buffer
  * per partition (d=64 → 32 KiB), never the vectors. The MODEL step is
  * driver-side — power iteration on a d×d matrix is microseconds and
  * independent of corpus size, so at 100 TB the driver work is identical
  * to sf0.001. The returned component is rounded and sign-canonicalized,
  * making it freezable into a literal-replay oracle (the proven IVF/PQ/LSH
  * pattern).
  *
  * Uncentered PCA by design (dominant direction of X·Xᵀ, not the
  * covariance): centering adds a second pass and a rank-1 driver-side
  * correction without changing the mechanics this operator demonstrates.
  */
object Pca {

  /** Gram accumulator: buffer is the flattened upper-triangle-inclusive
    * full d² sum matrix, grown lazily from the first vector (so callers
    * never pre-declare d). Associative + commutative merge → Spark plans
    * it with partial aggregation exactly like a built-in sum.
    */
  object GramAgg extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {
    override def zero: Array[Double] = Array.empty[Double]

    override def reduce(b: Array[Double], v: Seq[Double]): Array[Double] = {
      if (v == null) b
      else {
        val d = v.length
        // dimension guard: a ragged corpus must fail loudly here — a
        // longer vector would walk off the buffer and a SHORTER one would
        // silently accumulate with the wrong stride, corrupting the Gram
        // matrix (and a corrupted frozen component still hash-verifies).
        require(b.isEmpty || b.length == d * d,
          s"GramAgg: vector of dim $d in a corpus whose first-seen dim was " +
            s"${math.sqrt(b.length).toInt} — embedding dims must be uniform")
        val g = if (b.isEmpty) new Array[Double](d * d) else b
        val arr = v.toArray
        var i = 0
        while (i < d) {
          val vi = arr(i)
          var j = 0
          while (j < d) { g(i * d + j) += vi * arr(j); j += 1 }
          i += 1
        }
        g
      }
    }

    override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else {
        require(a.length == b.length,
          s"GramAgg: merging Gram buffers of different dims " +
            s"(${math.sqrt(a.length).toInt} vs ${math.sqrt(b.length).toInt})")
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      }
    }

    override def finish(r: Array[Double]): Seq[Double] = r.toSeq

    override def bufferEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** Trains the top principal direction: one distributed Gram pass, then
    * `iters` rounds of power iteration on the driver. Deterministic: fixed
    * uniform start vector, sign canonicalized (first component with
    * |w_i| > 1e-9 is made positive), each entry rounded to 9 decimals so
    * the vector embeds exactly in generated SQL.
    */
  def topComponent(vectors: DataFrame, vecCol: String, iters: Int = 40): Array[Double] = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val flat = vectors
      .select(col(vecCol).cast("array<double>"))
      .as[Seq[Double]]
      .select(GramAgg.toColumn)
      .head()
    val d = math.sqrt(flat.length.toDouble).toInt
    require(d * d == flat.length && d > 0, s"Gram size ${flat.length} is not square")
    val g = flat.toArray

    var x = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var it = 0
    while (it < iters) {
      val y = new Array[Double](d)
      var i = 0
      while (i < d) {
        var s = 0.0
        var j = 0
        while (j < d) { s += g(i * d + j) * x(j); j += 1 }
        y(i) = s
        i += 1
      }
      val n = math.sqrt(y.map(v => v * v).sum)
      x = if (n == 0) y else y.map(_ / n)
      it += 1
    }
    val lead = x.indexWhere(v => math.abs(v) > 1e-9)
    val signed = if (lead >= 0 && x(lead) < 0) x.map(-_) else x
    signed.map(v => BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  /** Projection of `vecCol` (cast to double) onto a frozen component, as a
    * sequential-sum dot product — bit-identical to DuckDB's
    * list_dot_product over the same literals.
    */
  def project(vecCol: Column, component: Array[Double]): Column =
    graft.functions.VectorExprs.dotProduct(
      vecCol.cast("array<double>"),
      array(component.map(lit(_)): _*))
}
