package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalable total order with contiguous global ranks.
  *
  * `row_number() OVER (ORDER BY ...)` with no PARTITION BY plans as a
  * single-partition window — every row through one task, the one shape
  * that cannot survive 100 TB. This operator produces the identical
  * result with no single-node stage:
  *
  *   1. range-repartition + sort within partitions on the sort key
  *      (RangePartitioning — the same exchange a global ORDER BY uses);
  *   2. `monotonically_increasing_id()` snapshots each row's partition
  *      ordinal (id = pid << 33 | local index, increasing in sort order
  *      within a partition);
  *   3. ONE tiny aggregate (a row per partition: count + min id) is
  *      cumulated on the driver into per-partition rank offsets;
  *   4. a broadcast join maps (pid, local ordinal) → global rank. The big
  *      table is shuffled exactly once, in step 1.
  *
  * The sort key must be a total order (include a tiebreaker column) —
  * otherwise ranks at partition boundaries are partitioner-dependent.
  * The sorted frame is `localCheckpoint`ed so steps 3 and 4 read the same
  * physical ids rather than recomputing the exchange twice.
  */
object GlobalRank {

  def withRank(df: DataFrame, rankCol: String, sortCols: Column*): DataFrame = {
    val sorted = df
      .repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("_mid", monotonically_increasing_id())
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    val parts = sorted
      .groupBy("_pid")
      .agg(count(lit(1)).as("_n"), min("_mid").as("_base"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val offsets = parts
      .scanLeft((0, 0L, 0L, 0L)) { case ((_, acc, _, _), (pid, n, base)) =>
        (pid, acc + n, base, acc)
      }
      .drop(1)
      .map { case (pid, _, base, before) => (pid, base, before) }
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("_pid", "_base", "_before")
    sorted
      .join(broadcast(offDf), "_pid")
      .withColumn(rankCol, (col("_mid") - col("_base") + col("_before") + 1L).cast("int"))
      .drop("_mid", "_pid", "_base", "_before")
  }
}
