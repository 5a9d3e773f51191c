package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge cases of the MMR greedy re-rank: the distributed shortlist can come
  * back smaller than k — or empty — and the driver loop must degrade to
  * "return what exists" instead of crashing on head-of-empty.
  */
class MmrSpec extends SparkSpec {

  private def emb(rows: (Long, Seq[Float])*) = {
    val s = spark
    import s.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("empty shortlist (query is the only vector) yields zero rows") {
    val out = Mmr.diversifiedTopK(spark, emb(0L -> Seq(1f, 0f, 0f)))
    assert(out.count() === 0)
    assert(out.columns.toSeq === Seq("rank", "vec_id", "qs"))
  }

  test("k larger than the candidate count returns every candidate, ranked") {
    val out = Mmr.diversifiedTopK(
      spark,
      emb(
        0L -> Seq(1f, 0f, 0f),
        1L -> Seq(0.9f, 0.1f, 0f),
        2L -> Seq(0f, 1f, 0f)),
      k = 10)
    val rows = out.orderBy("rank").collect()
    assert(rows.map(_.getLong(1)).toSet === Set(1L, 2L))
    assert(rows.map(_.getInt(0)).toSeq === Seq(1, 2))
  }

  test("full query still returns k diversified picks led by the top match") {
    val q = graft.SparkEntry.queries("q_mmr_rerank")(spark, sf)
    val rows = q.orderBy("rank").collect()
    assert(rows.length === 10)
    // rank-1 is always the raw-relevance argmax by construction
    assert(rows.head.getInt(0) === 1)
  }
}
