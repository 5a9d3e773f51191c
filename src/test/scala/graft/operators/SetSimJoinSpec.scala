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

  private def naiveContainment(t: Double): Set[(Long, Long, Long)] = {
    val tok = tokens.cache()
    val sizes = tok.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val res = tok.as("a")
      .join(tok.as("b"), col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.toDF("id_a", "na"), "id_a")
      .join(sizes.toDF("id_b", "nb"), "id_b")
      .filter(col("inter") * lit(1.0) / least(col("na"), col("nb")) >= lit(t))
      .select("id_a", "id_b", "inter")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    tok.unpersist()
    res
  }

  for (t <- Seq(0.5, 0.7, 0.9); dense <- Seq(false, true)) {
    val name = if (dense) "dense bitmap" else "prefix-postings"
    test(s"containment $name join == naive quadratic containment at t=$t") {
      val exact = naiveContainment(t)
      assert(exact.nonEmpty, "test data should contain qualifying pairs")
      val tok = tokens.select(col("doc_id").as("id"), col("h"))
      val res =
        if (dense) {
          val vocab = tok.select("h").distinct().orderBy("h").collect().map(_.getLong(0))
          SetSimJoin.containmentDenseJoin(SetSimJoin.encodeBitmaps(tok, vocab), t)
        } else SetSimJoin.containmentPrefixJoin(tok, t)
      val got = res.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
      assert(got === exact)
    }
  }

  test("containment auto dispatch matches naive at t=0.7") {
    val got = SetSimJoin.containmentSelfJoin(tokens, "doc_id", "h", 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
    assert(got === naiveContainment(0.7))
  }

  test("extreme size-ratio pair: Jaccard-LSH banding misses it, containment index finds it") {
    val s = spark
    import s.implicits._
    // doc 2 = a 400-word page; doc 1 = its first 13 words (12 of its 399
    // 2-gram shingles: containment 1.0, Jaccard 12/399 ≈ 0.03 — per-band
    // match probability ≈ J⁴, so banding structurally cannot surface the
    // pair). A third unrelated doc keeps the corpus non-trivial.
    val page = (0 until 400).map(i => s"tok$i").mkString(" ")
    val snippet = (0 until 13).map(i => s"tok$i").mkString(" ")
    val other = (1000 until 1040).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, snippet), (2L, page), (3L, other)).toDF("doc_id", "text")

    // the Jaccard-LSH candidate pairs (the pre-round-6 q_containment
    // candidate source) must MISS (1, 2) — deterministic given md5
    val sigs = MinHash.signatures(docs, "doc_id", "text")
    val banded = MinHash.lshCandidatePairs(sigs, "doc_id", rowsPerBand = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!banded.contains((1L, 2L)),
      "fixture invalid: banding found the extreme-ratio pair by luck")

    // the containment prefix index must find it with containment 1.0
    val tok = docs
      .select(col("doc_id"),
        explode(graft.functions.TextExprs.wordShingles(col("text"), 2)).as("sh"))
      .select(col("doc_id"), xxhash64(col("sh")).as("h"))
    val got = SetSimJoin.containmentSelfJoin(tok, "doc_id", "h", 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    assert(got.map(p => (p._1, p._2)).toSet === Set((1L, 2L)))
    val (_, _, inter, na, nb) = got.head
    assert(inter === 12 && na === 12 && nb === 399,
      s"containment must be exact: inter=$inter na=$na nb=$nb")
  }
}
