package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native PQ-encode kernel: all `m` subspace codes of one vector in one
  * tight loop.
  *
  * The expression-tree formulation ([[graft.operators.Pq.subDist]] per
  * (subspace, centroid): `lit(‖w‖²) − 2·dot(slice(v), lit(w))`, then
  * `array_position(array_min(...))` per subspace) inlines m·ksub dot-product
  * loops plus m argmin scans into ONE generated method once whole-stage
  * codegen fuses the projection with its neighbors — past janino's 64 KB
  * method limit. The failed compilation is not cached (only successes are),
  * so EVERY execution of the encode stage re-paid a ~1.3 s compile attempt
  * and then ran interpreted anyway (measured: the q_knn_ivfpq probe at
  * 1.65 s/run with whole-stage codegen on vs 0.36 s with it off, sf0.1).
  * This kernel collapses that to one small reference-object loop.
  *
  * Bit-exactness contract (the codes feed oracle-checked queries —
  * q_embed_pq compares them against DuckDB's replay of the same op tree):
  *   - subspace distance: `wn2[j][c] − 2.0 * Σ_i v[j·dsub+i]·w[i]`, the
  *     sum folded in ascending index order — exactly [[DotProduct]]'s fold
  *     over the slice, and `list_dot_product`'s in the oracle;
  *   - `wn2` is precomputed ONCE per books instance on the driver with the
  *     same ascending fold `Pq.subDist` used at lit() time;
  *   - argmin = FIRST index of the minimal distance under
  *     `java.lang.Double.compare` — `array_position(array_min(...))`
  *     semantics, including -0.0 < 0.0 and NaN-greatest.
  */
case class PqEncode(
    child: Expression,
    m: Int,
    dsub: Int,
    ksub: Int,
    // Seq (not Array) so case-class equality is semantic: plan
    // canonicalization and codegen caching key on expression equality
    books: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[ArrayType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  // flattened eval-time tables: flatBooks(j*ksub*dsub + c*dsub + i),
  // flatWn2(j*ksub + c) — built once per expression instance
  @transient private lazy val flatBooks: Array[Double] = {
    val a = new Array[Double](m * ksub * dsub)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ksub) {
        val w = books(j)(c)
        var i = 0
        while (i < dsub) { a(j * ksub * dsub + c * dsub + i) = w(i); i += 1 }
        c += 1
      }
      j += 1
    }
    a
  }
  @transient private lazy val flatWn2: Array[Double] =
    PqEncode.wn2Table(m, dsub, ksub, books)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val codes = new Array[Int](m)
    PqEncode.encodeInto(v, m, dsub, ksub, flatBooks, flatWn2, codes)
    new GenericArrayData(codes)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("pqBooks", flatBooks, "double[]")
    val wn2Ref = ctx.addReferenceObj("pqWn2", flatWn2, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val codes = ctx.freshName("codes")
      s"""
         |int[] $codes = new int[$m];
         |graft.functions.PqEncode.encodeInto($v, $m, $dsub, $ksub,
         |  $booksRef, $wn2Ref, $codes);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)

  override def prettyName: String = "pq_encode"
}

object PqEncode {

  /** ‖w‖² per (subspace, centroid), ascending fold — the exact doubles
    * `Pq.subDist`'s driver-side `lit(wn2)` computed.
    */
  private[functions] def wn2Table(
      m: Int, dsub: Int, ksub: Int, books: Seq[Seq[Seq[Double]]]): Array[Double] = {
    val a = new Array[Double](m * ksub)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ksub) {
        var s = 0.0
        books(j)(c).foreach(x => s += x * x)
        a(j * ksub + c) = s
        c += 1
      }
      j += 1
    }
    a
  }

  /** The shared interpreted/codegen inner loop (public: called from
    * generated code). First-minimal-index argmin under Double.compare,
    * distances in the exact `wn2 − 2·(v·w)` ascending-fold arithmetic of
    * the expression form. Truncated vectors (fewer than m·dsub elements)
    * dot only the available prefix — `DotProduct`'s min-length rule.
    */
  def encodeInto(
      v: ArrayData,
      m: Int,
      dsub: Int,
      ksub: Int,
      flatBooks: Array[Double],
      flatWn2: Array[Double],
      out: Array[Int]): Unit = {
    val n = v.numElements()
    var j = 0
    while (j < m) {
      var bestIdx = 0
      var best = 0.0
      var c = 0
      while (c < ksub) {
        var s = 0.0
        val base = j * ksub * dsub + c * dsub
        val off = j * dsub
        var i = 0
        while (i < dsub && off + i < n) {
          s += v.getDouble(off + i) * flatBooks(base + i)
          i += 1
        }
        val d = flatWn2(j * ksub + c) - 2.0 * s
        if (c == 0 || java.lang.Double.compare(d, best) < 0) {
          best = d
          bestIdx = c
        }
        c += 1
      }
      out(j) = bestIdx
      j += 1
    }
  }
}

/** First-argmax IVF cell assignment in one kernel: `argmax_c (v · w_c)`,
  * 0-based, FIRST maximal index under `java.lang.Double.compare` — exactly
  * `array_position(array(dot...), array_max(...)) − 1` over [[DotProduct]]
  * columns (the shape it replaces, which inlined k dot loops into the
  * fused stage and pushed its generated method past HotSpot's 8000-byte
  * JIT refusal threshold — see [[PqEncode]]'s doc for the failure mode).
  * Dots fold in ascending index order over min(|v|, |w|) elements, the
  * [[DotProduct]] rule, so the chosen cell is bit-identical.
  */
case class ArgMaxDot(
    child: Expression,
    centroids: Seq[Seq[Double]]) // Seq for semantic case-class equality
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[ArrayType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = IntegerType

  @transient private lazy val k: Int = centroids.size
  @transient private lazy val dim: Int = if (centroids.isEmpty) 0 else centroids.head.size
  @transient private lazy val flat: Array[Double] = {
    val a = new Array[Double](k * dim)
    var c = 0
    while (c < k) {
      val w = centroids(c)
      var i = 0
      while (i < dim) { a(c * dim + i) = w(i); i += 1 }
      c += 1
    }
    a
  }

  override def nullSafeEval(input: Any): Any =
    ArgMaxDot.eval(input.asInstanceOf[ArrayData], k, dim, flat)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidsFlat", flat, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.ArgMaxDot.eval($v, $k, $dim, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): ArgMaxDot =
    copy(child = newChild)

  override def prettyName: String = "arg_max_dot"
}

object ArgMaxDot {

  /** Shared interpreted/codegen loop (public: called from generated code).
    * First maximal dot under Double.compare; ascending-index dot fold over
    * min(|v|, dim) elements per centroid.
    */
  def eval(v: ArrayData, k: Int, dim: Int, flat: Array[Double]): Int = {
    val n = math.min(v.numElements(), dim)
    var bestIdx = 0
    var best = 0.0
    var c = 0
    while (c < k) {
      var s = 0.0
      val base = c * dim
      var i = 0
      while (i < n) { s += v.getDouble(i) * flat(base + i); i += 1 }
      if (c == 0 || java.lang.Double.compare(s, best) > 0) {
        best = s
        bestIdx = c
      }
      c += 1
    }
    bestIdx
  }
}

object PqExprs {

  /** All m PQ codes of `v` as one array<int>, single-kernel codegen. */
  def pqCodes(v: Column, b: graft.operators.Pq.Books): Column =
    Bridge.column(PqEncode(Bridge.expression(v), b.m, b.dsub, b.ksub, b.books))

  /** 0-based first-argmax cell of `v` against `centroids`, one kernel. */
  def argMaxDot(v: Column, centroids: Seq[Seq[Double]]): Column =
    Bridge.column(ArgMaxDot(Bridge.expression(v), centroids))
}
