package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** FREQUENT-VALUES (top-K / heavy-hitter) sketch aggregate over a
  * column's stored-string domain (string and integral stats columns) —
  * the DataSketches frequent-items sketch (Misra–Gries family:
  * space-bounded, mergeable, deterministic error ≤ n/maxMapSize) as a
  * native Catalyst [[TypedImperativeAggregate]], so it rides the lake's
  * single per-commit stats pass exactly like the HLL NDV sketch does.
  *
  * Purpose: EQUALITY selectivity for skewed categorical domains. Range
  * skew is served by the equi-height histogram edges (CBO mode); a
  * skewed STRING column (status codes, language tags) or INT code had
  * only uniform-over-NDV estimation, off by orders of magnitude when
  * one value holds 95% of the rows — and in size-only mode, no
  * refinement at all. The per-directory sketch pins every heavy value's
  * count within maxError and bounds the residual mass the rare tail
  * shares — see [[FreqSketch.estimate]]; a point filter on a
  * near-unique integral key prices at ~1 row with no CBO flag.
  *
  * Partial aggregation applies (each partition sketches locally, merge
  * is the sketch's own merge), so the shuffle carries one ~KB sketch
  * per partition, never values.
  */
case class FreqSketchAgg(
    child: Expression,
    maxMapSize: Int = FreqSketch.DefaultMapSize,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ItemsSketch[String]]
    with UnaryLike[Expression] {

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(
      buffer: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(
      buffer: ItemsSketch[String],
      other: ItemsSketch[String]): ItemsSketch[String] = buffer.merge(other)

  override def eval(buffer: ItemsSketch[String]): Any =
    buffer.toByteArray(FreqSketch.serde)

  override def serialize(buffer: ItemsSketch[String]): Array[Byte] =
    buffer.toByteArray(FreqSketch.serde)

  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), FreqSketch.serde)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "freq_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqSketchAgg =
    copy(child = newChild)
}

object FreqSketch {

  /** Tracks up to ~0.75·size heavy values per directory; error on any
    * count ≤ nonNullRows/size. 256 prices a 95%-skewed column within
    * 0.4% of a directory's rows while the serialized sketch stays a few
    * KB — manifest-line-sized, like the HLL sketch it rides beside.
    */
  val DefaultMapSize = 256

  private[functions] val serde = new ArrayOfStringsSerDe

  /** The aggregate as a Column, for the stats pass. */
  def freqSketchAgg(c: Column): Column =
    Bridge.column(FreqSketchAgg(Bridge.expression(c)).toAggregateExpression())

  /** Estimated rows holding `value` in ONE directory, from that
    * directory's sketch. For a TRACKED value the sketch's upper bound
    * (never an undercount — a heavy value must price heavy, or a join
    * would mis-broadcast the 95% side). For an UNTRACKED value, the
    * residual mass after every confidently-heavy value's lower bound,
    * shared uniformly over the remaining distinct values (documented
    * approximation: the tail is priced as flat; what the sketch
    * guarantees is that no tail value exceeds residual + maxError, and
    * the estimate never drops below 1 row for a value the bloom/stats
    * pruning already admitted).
    *
    * @param nonNull the directory's non-null row count (from `#rows`
    *                minus the ndv layer's null count)
    * @param ndv     the directory's own distinct estimate (its HLL sketch)
    */
  def estimate(
      sketchBytes: Array[Byte], nonNull: Long, ndv: Long, value: String): Double = {
    if (nonNull <= 0L) return 0.0
    val sk = ItemsSketch.getInstance(Memory.wrap(sketchBytes), serde)
    val heavy = sk.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
    val tracked = heavy.find(_.getItem == value)
    tracked match {
      case Some(r) => math.min(nonNull.toDouble, r.getUpperBound.toDouble)
      case None =>
        val heavyMass = heavy.map(_.getLowerBound).sum
        val residual = math.max(0L, nonNull - heavyMass)
        val tailNdv = math.max(1L, ndv - heavy.length)
        math.max(1.0, math.min(residual.toDouble, residual.toDouble / tailNdv))
    }
  }

  /** Merged top-K view for diagnostics (`t$stats` / procedures): the
    * union of per-directory sketches, heaviest first, (value, estimate).
    */
  def topK(sketches: Seq[Array[Byte]], k: Int): Seq[(String, Long)] = {
    val all = sketches.map(b => ItemsSketch.getInstance(Memory.wrap(b), serde))
    if (all.isEmpty) return Nil
    val merged = all.reduce(_ merge _)
    merged.getFrequentItems(ErrorType.NO_FALSE_POSITIVES)
      .sortBy(-_.getEstimate).take(k)
      .map(r => r.getItem -> r.getEstimate).toSeq
  }
}
