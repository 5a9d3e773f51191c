package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Prefix filtering must be invisible: the filtered join returns exactly
  * the pairs the naive quadratic join returns, at every threshold.
  */
class SetSimJoinSpec extends SparkSpec {

  private def tokens = {
    import MinHash.{shingles, words}
    spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), words(col("text")).as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(shingles(col("ws"), 2)).as("s"))
      .select(col("doc_id"), xxhash64(col("s")).as("h"))
  }

  private def naivePairs(t: Double): Set[(Long, Long, Long)] = {
    val tok = tokens.cache()
    val sizes = tok.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val res = tok.as("a")
      .join(tok.as("b"), col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.toDF("id_a", "na"), "id_a")
      .join(sizes.toDF("id_b", "nb"), "id_b")
      .filter(col("inter") >= (col("na") + col("nb") - col("inter")) * lit(t))
      .select("id_a", "id_b", "inter")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    tok.unpersist()
    res
  }

  private def strategyPairs(t: Double, dense: Boolean): Set[(Long, Long, Long)] = {
    val tok = tokens.select(col("doc_id").as("id"), col("h"))
    val res =
      if (dense) {
        val vocab = tok.select("h").distinct().orderBy("h").collect().map(_.getLong(0))
        SetSimJoin.denseSelfJoin(SetSimJoin.encodeBitmaps(tok, vocab), t)
      } else SetSimJoin.prefixSelfJoin(tok, t)
    res.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
  }

  for (t <- Seq(0.3, 0.5, 0.8); dense <- Seq(false, true)) {
    val name = if (dense) "dense bitmap" else "prefix-filtered"
    test(s"$name join == naive quadratic join at t=$t") {
      val exact = naivePairs(t)
      assert(exact.nonEmpty, "test data should contain qualifying pairs")
      assert(strategyPairs(t, dense) === exact)
    }
  }

  test("auto dispatch matches naive at t=0.5") {
    val got = SetSimJoin.jaccardSelfJoin(tokens, "doc_id", "h", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
    assert(got === naivePairs(0.5))
  }
}
