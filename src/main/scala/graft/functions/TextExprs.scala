package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared row kernel for [[WordShingles]] — called from both interpreted
  * eval and the generated code (whole-stage codegen emits a single static
  * call; Janino resolves user classes through the session classloader).
  */
object TextKernels {

  private val Ws = java.util.regex.Pattern.compile("\\s+")

  /** lowercase → whitespace-split (empties dropped) → n-word shingles
    * joined with ' ' → distinct in first-occurrence order.
    * Semantics identical to the Column formulation
    * `array_distinct(transform(sequence(...), concat_ws(" ", ...)))` over
    * `filter(split(lower(text), "\\s+"), _ != "")` — one call per row
    * instead of an interpreted lambda per element.
    */
  def wordShingles(text: UTF8String, n: Int): ArrayData = {
    // Locale.ROOT: match Spark lower() / DuckDB lower() semantics on any
    // JVM default locale (e.g. Turkish 'I' -> 'ı' under the default).
    val parts = Ws.split(text.toString.toLowerCase(java.util.Locale.ROOT))
    val words = new java.util.ArrayList[String](parts.length)
    parts.foreach(w => if (w.nonEmpty) words.add(w))
    val m = words.size - n + 1
    val out = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i < m) {
      val sb = new java.lang.StringBuilder(words.get(i))
      var j = 1
      while (j < n) { sb.append(' ').append(words.get(i + j)); j += 1 }
      out.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  /** all lowercased whitespace-split words (empties dropped), in order —
    * the non-distinct companion of [[wordShingles]].
    */
  def wordTokens(text: UTF8String): ArrayData = {
    val parts = Ws.split(text.toString.toLowerCase(java.util.Locale.ROOT))
    val out = new java.util.ArrayList[Any](parts.length)
    parts.foreach(w => if (w.nonEmpty) out.add(UTF8String.fromString(w)))
    new GenericArrayData(out.toArray)
  }

  /** EVERY word n-gram in token order, multiplicity kept — the
    * positional companion of [[wordShingles]] (which dedups): element i
    * IS the n-token run starting at token offset i, so `posexplode`
    * over this array gives offset-addressed grams for exact-substring
    * (verbatim-run) matching, where the distinct set face can only say
    * "some overlap somewhere".
    */
  def wordShinglesAll(text: UTF8String, n: Int): ArrayData = {
    val parts = Ws.split(text.toString.toLowerCase(java.util.Locale.ROOT))
    val words = new java.util.ArrayList[String](parts.length)
    parts.foreach(w => if (w.nonEmpty) words.add(w))
    val m = words.size - n + 1
    val out = new java.util.ArrayList[Any](math.max(m, 0))
    var i = 0
    while (i < m) {
      val sb = new java.lang.StringBuilder(words.get(i))
      var j = 1
      while (j < n) { sb.append(' ').append(words.get(i + j)); j += 1 }
      out.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Winnowing fingerprints of an (already whitespace-normalized) text:
    * 60-bit md5 k-gram hashes → sliding-window-w minima → distinct, in
    * first-occurrence order. The 60-bit value equals DuckDB/Spark
    * `conv(substr(md5(gram), 1, 15), 16, 10)` — i.e. the big-endian first
    * 8 digest bytes shifted right 4 — so the oracle computes identical
    * fingerprints.
    */
  def winnowFingerprints(text: UTF8String, k: Int, w: Int): ArrayData = {
    val nChars = text.numChars()
    val m = nChars - k + 1
    if (m < w) return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val digest = new Array[Byte](16)
    val hashes = new Array[Long](m)
    def pack(): Long = {
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (digest(b) & 0xffL); b += 1 }
      v >>> 4
    }
    if (text.numBytes() == nChars) {
      // ASCII fast path: char k-grams == byte ranges — hash in place, no
      // substring/array allocation per gram
      val bytes = text.getBytes
      var i = 0
      while (i < m) {
        md.reset()
        md.update(bytes, i, k)
        md.digest(digest, 0, 16)
        hashes(i) = pack()
        i += 1
      }
    } else {
      val s = text.toString
      var i = 0
      while (i < m) {
        md.reset()
        md.update(s.substring(i, i + k).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        md.digest(digest, 0, 16)
        hashes(i) = pack()
        i += 1
      }
    }
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    var j = 0
    while (j <= m - w) {
      var min = hashes(j)
      var x = j + 1
      while (x < j + w) { if (hashes(x) < min) min = hashes(x); x += 1 }
      out.add(min)
      j += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var n = 0
    while (it.hasNext) { arr(n) = it.next(); n += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(arr)
  }

  /** Unicode NFC normalization (canonical composition). ASCII and
    * already-composed inputs take the `isNormalized` fast path — a single
    * scan, no allocation — so the common 100 TB case (mostly-NFC web text)
    * pays nothing. Matches DuckDB `nfc_normalize` (both implement UAX #15).
    */
  def nfcNormalize(text: UTF8String): UTF8String = {
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) text
    else UTF8String.fromString(java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }
}

/** Distinct word n-gram shingles of a text column as one native codegen'd
  * expression. The equivalent built-in formulation chains four
  * higher-order functions — each CodegenFallback, interpreted per element,
  * and together the dominant cost of every shingle-based dedup pass.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TextKernels.wordShingles(input.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.wordShingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)

  override def prettyName: String = "word_shingles"
}

/** Positional (non-distinct) word n-gram shingles — element i is the
  * n-token run at token offset i (see [[TextKernels.wordShinglesAll]]).
  */
case class WordShinglesAll(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TextKernels.wordShinglesAll(input.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.wordShinglesAll($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShinglesAll =
    copy(child = newChild)

  override def prettyName: String = "word_shingles_all"
}

/** All words of a text column (lowercased, ws-split, empties dropped) as
  * one native codegen'd expression — replaces the interpreted
  * `filter(split(lower(text), "\\s+"), _ != "")` HOF pair.
  */
case class WordTokens(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TextKernels.wordTokens(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.wordTokens($c)")

  override protected def withNewChildInternal(newChild: Expression): WordTokens =
    copy(child = newChild)

  override def prettyName: String = "word_tokens"
}

/** Winnowing fingerprint set of a normalized text column as one native
  * expression — the HOF formulation (two nested `transform`s over
  * `sequence` with an md5/conv per element) is interpreted per k-gram and
  * dominates the whole fingerprint pass.
  */
case class WinnowFingerprintsExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(k >= 1 && w >= 1, s"need k >= 1 and w >= 1, got k=$k w=$w")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TextKernels.winnowFingerprints(input.asInstanceOf[UTF8String], k, w)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.winnowFingerprints($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprintsExpr =
    copy(child = newChild)

  override def prettyName: String = "winnow_fingerprints"
}

/** Unicode NFC normalization as a native codegen'd expression — the
  * canonicalization every text-dedup key needs (decomposed "é" and
  * precomposed "é" must fingerprint identically). No Spark built-in
  * exposes java.text.Normalizer; a Scala UDF would break whole-stage
  * codegen on the hottest scan.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    TextKernels.nfcNormalize(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.nfcNormalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}

object TextExprs {

  /** distinct word n-gram shingles (lowercased, ws-split) of a text col. */
  def wordShingles(text: Column, n: Int): Column =
    Bridge.column(WordShingles(Bridge.expression(text), n))

  /** all words of a text col (lowercased, ws-split, empties dropped). */
  def wordTokens(text: Column): Column =
    Bridge.column(WordTokens(Bridge.expression(text)))

  /** every word n-gram in token order (element i = run at offset i). */
  def wordShinglesAll(text: Column, n: Int): Column =
    Bridge.column(WordShinglesAll(Bridge.expression(text), n))

  /** winnowing fingerprint set of a (normalized) text col. */
  def winnowFingerprints(text: Column, k: Int, w: Int): Column =
    Bridge.column(WinnowFingerprintsExpr(Bridge.expression(text), k, w))

  /** Unicode NFC canonical composition of a text col. */
  def nfc(text: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(text)))
}
