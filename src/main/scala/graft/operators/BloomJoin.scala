package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter semi-join reduction — the scale pattern for joining a huge
  * probe table against a build side too large to broadcast as a hash set
  * but whose KEYS fit a few megabytes of bloom bits.
  *
  * Catalyst's own InjectRuntimeFilter applies this rewrite automatically
  * only under size/selectivity heuristics and only within one query; this
  * operator makes it explicit and reusable (build once, filter many
  * probe-side scans — e.g. one dedup blocklist against every shard of a
  * 100 TB corpus).
  *
  * Flow: one aggregate job folds the build keys into a
  * `BloomFilterAggregate` sketch (partial aggregation: each partition
  * builds bits locally, merge is OR — one tiny shuffle row per partition);
  * the serialized bits ship to executors as a literal (same transport as a
  * broadcast); the probe side drops ~all non-joining rows BEFORE its
  * shuffle via codegen'd `might_contain`. A final semi join stays exact —
  * the bloom filter only thins the shuffle (false positives pass, ~fpp of
  * non-matches), it never decides membership.
  */
object BloomJoin {

  /** Serialized bloom filter of `key` over `df` (driver-collected, like a
    * broadcast build). Bits sized by the standard -n·ln(fpp)/ln²2 formula.
    */
  def buildFilter(
      df: DataFrame,
      key: String,
      expectedItems: Long,
      fpp: Double = 0.03): Array[Byte] = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val numBits = math.max(
      64L,
      (-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(Bridge.expression(col(key)))),
      Literal(expectedItems),
      Literal(numBits)).toAggregateExpression()
    df.select(Bridge.column(agg).as("bf")).head().getAs[Array[Byte]](0)
  }

  /** Codegen'd membership probe against a serialized filter. */
  def mightContain(filter: Array[Byte], key: Column): Column =
    Bridge.column(
      BloomFilterMightContain(
        Literal(filter, BinaryType),
        new XxHash64(Seq(Bridge.expression(key)))))

  /** Exact left-semi join with a bloom pre-filter on the probe side:
    * `big ⋉ small` where non-matching `big` rows die at the scan, not in
    * the join shuffle.
    */
  def semiJoin(
      big: DataFrame,
      bigKey: String,
      small: DataFrame,
      smallKey: String,
      expectedItems: Long = 1L << 20,
      fpp: Double = 0.03): DataFrame = {
    val bf = buildFilter(small, smallKey, expectedItems, fpp)
    big
      .filter(mightContain(bf, col(bigKey)))
      .join(small.select(smallKey), col(bigKey) === col(smallKey), "left_semi")
  }
}
