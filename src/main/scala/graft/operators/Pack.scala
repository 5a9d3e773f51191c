package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GPT-style sequence packing: documents laid out in a total order form
  * one virtual token stream which is cut into fixed-length training
  * sequences ("concat-and-chunk"); a document belongs to every chunk its
  * token interval overlaps. The pipeline op that turns a filtered corpus
  * into fixed-shape training rows.
  *
  * The scale hazard is the global running token offset: the naive
  * `sum() OVER (ORDER BY ...)` with no PARTITION BY is a single-partition
  * window — every row through one task. [[withGlobalOffset]] computes the
  * identical prefix sum the way [[GlobalRank]] computes ranks:
  *
  *   1. range-repartition + sort on the order key (the exchange a global
  *      ORDER BY would use anyway);
  *   2. per-partition exclusive prefix sums via a window PARTITIONED by
  *      `spark_partition_id()` — parallel, never single-task;
  *   3. one tiny per-partition total aggregate, cumulated on the driver
  *      into partition offsets (rows = shuffle partitions, not data);
  *   4. broadcast-join the offsets back: start = local prefix + offset.
  *
  * The big table shuffles exactly once (step 1). Chunk assignment is then
  * pure row-level arithmetic + a bounded explode (each doc emits
  * ceil(tok/seqLen)+1 rows at most).
  */
object Pack {

  /** Adds `s0` = exclusive global running sum of `tokCol` (long) in
    * `sortCol` order. `sortCol` must be a total order (unique key).
    */
  def withGlobalOffset(df: DataFrame, tokCol: String, sortCol: Column): DataFrame = {
    val sorted = df
      .repartitionByRange(sortCol)
      .sortWithinPartitions(sortCol)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint() // pin partition ids: offsets and rows must agree
    val w = Window.partitionBy("_pid").orderBy(sortCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = sorted.withColumn(
      "_local", coalesce(sum(col(tokCol)).over(w), lit(0L)))
    val parts = sorted
      .groupBy("_pid").agg(sum(col(tokCol)).as("_t"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    val offsets = parts
      .scanLeft((0, 0L, 0L)) { case ((_, acc, _), (pid, t)) => (pid, acc + t, acc) }
      .drop(1)
      .map { case (pid, _, before) => (pid, before) }
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("_pid", "_before")
    local
      .join(broadcast(offDf), "_pid")
      .withColumn("s0", col("_local") + col("_before"))
      .drop("_pid", "_local", "_before")
  }

  /** Per-GROUP exclusive running sum: `s0` restarts at 0 inside every
    * `groupCol` value, in `sortCol` order within the group. The same
    * two-phase construction as [[withGlobalOffset]], but range-
    * partitioned on (group, sortKey) with per-(partition, group) windows
    * and totals — a HOT group (one language holding half a 100 TB
    * corpus) still spans many partitions and many parallel window
    * tasks, where the naive `PARTITION BY group ORDER BY ...` window
    * funnels the whole group through one task. Driver state is
    * O(partitions + groups) total rows.
    */
  def withGroupedOffset(
      df: DataFrame,
      groupCol: String,
      tokCol: String,
      sortCol: Column): DataFrame = {
    val sorted = df
      .repartitionByRange(col(groupCol), sortCol)
      .sortWithinPartitions(col(groupCol), sortCol)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint() // pin partition ids: offsets and rows must agree
    val w = Window.partitionBy(col("_pid"), col(groupCol)).orderBy(sortCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = sorted.withColumn(
      "_local", coalesce(sum(col(tokCol)).over(w), lit(0L)))
    val parts = sorted
      .groupBy(col("_pid"), col(groupCol)).agg(sum(col(tokCol)).as("_t"))
      .collect()
      .map(r => (r.getInt(0), r.get(1).toString, r.getLong(2)))
    val offsets = parts
      .groupBy(_._2)
      .toSeq
      .flatMap { case (g, ps) =>
        ps.sortBy(_._1)
          .scanLeft((0, 0L, 0L)) { case ((_, acc, _), (pid, _, t)) => (pid, acc + t, acc) }
          .drop(1)
          .map { case (pid, _, before) => (pid, g, before) }
          .toSeq
      }
    val spark = df.sparkSession
    import spark.implicits._
    // the offset lookup joins on (_pid, group-as-string): string-keying
    // the group side once keeps the tiny broadcast frame type-agnostic
    val offDf = offsets.toDF("_opid", "_g", "_before")
    local
      .join(
        broadcast(offDf),
        col("_pid") === col("_opid") && col(groupCol).cast("string") === col("_g"))
      .withColumn("s0", col("_local") + col("_before"))
      .drop("_pid", "_opid", "_g", "_local", "_before")
  }

  /** One row per (document, chunk) overlap: `chunk_id` and the number of
    * the document's tokens that land in that chunk. Zero-token documents
    * occupy no chunk and are dropped.
    */
  def packChunks(
      df: DataFrame,
      idCol: String,
      tokCol: String,
      seqLen: Long,
      sortCol: Column): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    withGlobalOffset(df.filter(col(tokCol) > 0), tokCol, sortCol)
      .withColumn("e0", col("s0") + col(tokCol))
      // integer `div`, never FP division: offsets at 100 TB token counts
      // sit beyond exact double range
      .withColumn(
        "chunk_id",
        explode(sequence(expr(s"s0 div $seqLen"), expr(s"(e0 - 1) div $seqLen"))))
      .select(
        col(idCol),
        col("chunk_id"),
        (least(col("e0"), (col("chunk_id") + 1) * seqLen) -
          greatest(col("s0"), col("chunk_id") * seqLen)).as("tok_in_chunk"))
  }

  /** Per-GROUP packing: chunk ids restart inside every group, so shards
    * come out group-pure (per-language training shards being the
    * canonical use). Same chunk arithmetic over [[withGroupedOffset]].
    */
  def packChunksByGroup(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      tokCol: String,
      seqLen: Long,
      sortCol: Column): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    withGroupedOffset(df.filter(col(tokCol) > 0), groupCol, tokCol, sortCol)
      .withColumn("e0", col("s0") + col(tokCol))
      .withColumn(
        "chunk_id",
        explode(sequence(expr(s"s0 div $seqLen"), expr(s"(e0 - 1) div $seqLen"))))
      .select(
        col(groupCol),
        col(idCol),
        col("chunk_id"),
        (least(col("e0"), (col("chunk_id") + 1) * seqLen) -
          greatest(col("s0"), col("chunk_id") * seqLen)).as("tok_in_chunk"))
  }
}
