package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance diversified retrieval: from a relevance
  * shortlist, greedily pick k items maximizing
  *
  *   λ·sim(c, query) − (1−λ)·max_{s ∈ selected} sim(c, s)
  *
  * — the standard de-redundancy re-rank of a retrieval pipeline.
  *
  * Scale split: stage 1 (the 100 TB part) is the distributed cosine
  * shortlist — one broadcast of the query vector, scan + TakeOrdered(m).
  * Stage 2 is the greedy re-rank over m≈30 survivors, which is O(k·m)
  * dot products on the driver — the same place a reranker service runs.
  *
  * Determinism contract (what makes the DuckDB oracle exact): every
  * similarity is rounded to 6 decimals before ANY comparison, all ties
  * break on vec_id, and the MMR weights are rendered into the oracle SQL
  * from the same double literals the driver loop uses (never `1 − λ`
  * recomputed — 1 - 0.7 != 0.3 in binary).
  */
object Mmr {

  val Lambda = 0.7
  val OneMinusLambda = 0.3

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  private def dotd(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Diversified top-k of `emb` (columns vec_id, embedding) against the
    * stored vector `queryId`. Returns (rank, vec_id, qs).
    */
  def diversifiedTopK(
      spark: SparkSession,
      emb: DataFrame,
      queryId: Long = 0L,
      m: Int = 30,
      k: Int = 10): DataFrame = {
    val e = Similarity.withNorm(emb)
    val q = e.filter(col("vec_id") === queryId)
      .select(col("v").as("qv"), col("norm").as("qn"))
    val shortlist = e.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(
        col("vec_id"), col("v"), col("norm"),
        round(Similarity.dot(col("v"), col("qv")) / (col("norm") * col("qn")), 6).as("qs"))
      .orderBy(col("qs").desc, col("vec_id"))
      .limit(m)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2), r.getDouble(3)))

    import spark.implicits._
    // empty shortlist (no vectors besides the query, or an empty table):
    // zero diversified picks, not a head-of-empty crash.
    if (shortlist.isEmpty)
      return Seq.empty[(Int, Long, Double)].toDF("rank", "vec_id", "qs")

    val selected = scala.collection.mutable.ArrayBuffer(shortlist.head)
    while (selected.size < k && selected.size < shortlist.length) {
      val remaining = shortlist.filterNot(c => selected.exists(_._1 == c._1))
      val best = remaining.map { c =>
        val ms = selected.map(s => round6(dotd(c._2, s._2) / (c._3 * s._3))).max
        (Lambda * c._4 - OneMinusLambda * ms, c)
      }.reduceLeft { (a, b) =>
        if (b._1 > a._1 || (b._1 == a._1 && b._2._1 < a._2._1)) b else a
      }
      selected += best._2
    }
    selected.zipWithIndex
      .map { case ((id, _, _, qs), i) => (i + 1, id, round6(qs)) }
      .toSeq.toDF("rank", "vec_id", "qs")
  }

  /** DuckDB replay of the same greedy: shortlist CTE, then one CTE per
    * selection step with the accumulated picks as a UNION chain.
    */
  def oracleSql(queryId: Long = 0L, m: Int = 30, k: Int = 10): String = {
    val lam = Lambda.toString
    val oml = OneMinusLambda.toString
    val steps = (2 to k).map { t =>
      val prev = s"sel${t - 1}"
      s"""s$t AS MATERIALIZED (
         |  SELECT vec_id, v, nrm, qs FROM (
         |    SELECT c.vec_id, c.v, c.nrm, c.qs,
         |      $lam * c.qs - $oml * (
         |        SELECT max(round(list_dot_product(c.v, s.v) / (c.nrm * s.nrm), 6))
         |        FROM $prev s) AS sc
         |    FROM short c
         |    WHERE c.vec_id NOT IN (SELECT vec_id FROM $prev))
         |  ORDER BY sc DESC, vec_id LIMIT 1),
         |sel$t AS MATERIALIZED (SELECT * FROM sel${t - 1} UNION ALL SELECT * FROM s$t)""".stripMargin
    }.mkString(",\n")
    val out = (1 to k)
      .map(t => s"SELECT $t AS rank, vec_id, round(qs, 6) AS qs FROM s$t")
      .mkString("\nUNION ALL\n")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |q AS (SELECT v AS qv, sqrt(list_dot_product(v, v)) AS qn FROM e WHERE vec_id = $queryId),
       |short AS MATERIALIZED (
       |  SELECT e.vec_id, e.v, sqrt(list_dot_product(e.v, e.v)) AS nrm,
       |    round(list_dot_product(e.v, q.qv) / (sqrt(list_dot_product(e.v, e.v)) * q.qn), 6) AS qs
       |  FROM e, q WHERE e.vec_id != $queryId
       |  ORDER BY qs DESC, vec_id LIMIT $m),
       |s1 AS MATERIALIZED (SELECT vec_id, v, nrm, qs FROM short ORDER BY qs DESC, vec_id LIMIT 1),
       |sel1 AS MATERIALIZED (SELECT * FROM s1),
       |$steps
       |SELECT CAST(rank AS INT) AS rank, vec_id, qs FROM (
       |$out)""".stripMargin
  }
}
