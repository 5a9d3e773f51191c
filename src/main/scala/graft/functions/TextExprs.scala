package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
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
    val parts = Ws.split(text.toString.toLowerCase)
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

object TextExprs {

  /** distinct word n-gram shingles (lowercased, ws-split) of a text col. */
  def wordShingles(text: Column, n: Int): Column =
    Bridge.column(WordShingles(Bridge.expression(text), n))
}
