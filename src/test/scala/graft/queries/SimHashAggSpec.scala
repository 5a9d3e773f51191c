package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[SimHash.SimHashAgg]] (one Array[Int] buffer) must be bit-identical to
  * the per-bit voteCol×bits + packBits formulation it replaced — the form
  * the DuckDB oracle still unrolls — at both deployed widths.
  */
class SimHashAggSpec extends SparkSpec {

  test("single-buffer aggregator matches the per-bit voteCol formulation") {
    val tok = spark.read.parquet(s"$sf/documents.parquet")
      .select(
        col("doc_id"),
        explode(graft.functions.TextExprs.wordShingles(col("text"), 1)).as("w"))
      .withColumn("h", graft.operators.MinHash.shingleHash(col("w")))
      .cache()
    try {
      for (bits <- Seq(16, 48)) {
        val agg = tok.groupBy("doc_id")
          .agg(SimHash.signatureAgg(col("h"), bits).as("sig"))
        val lanes = tok.groupBy("doc_id")
          .agg(
            SimHash.voteCol(col("h"), 0),
            (1 until bits).map(j => SimHash.voteCol(col("h"), j)): _*)
          .select(col("doc_id"), SimHash.packBits(bits).as("sig"))
        assert(agg.count() > 0, s"bits=$bits produced no signatures")
        assert(agg.except(lanes).isEmpty, s"bits=$bits: agg rows missing from lanes")
        assert(lanes.except(agg).isEmpty, s"bits=$bits: lane rows missing from agg")
      }
    } finally tok.unpersist(blocking = false)
  }

  test("vote ties (count 0) pack as bit 0 in both forms") {
    // two word-hashes whose bit j values are 1 and 0 vote +1 and -1: tie.
    val a = new SimHash.SimHashAgg(4)
    val tied = a.merge(a.reduce(a.zero, 0x5L), a.reduce(a.zero, 0xAL))
    assert(tied.forall(_ == 0) && a.finish(tied) === 0L)
    // strict majority sets the bit
    val majority = a.reduce(tied.clone(), 0x3L)
    assert(a.finish(majority) === 0x3L)
  }
}
