package graft.operators

import graft.SparkSpec
import graft.engine.Session
import org.apache.spark.sql.functions._

class MinHashSpec extends SparkSpec {

  private lazy val docs = Session.table(spark, sf, "documents")

  /** exact quadratic 2-gram Jaccard pairs at threshold — the ground truth. */
  private def exactPairs(thr: Double): Set[(Long, Long, Double)] = {
    val sh = MinHash.shingleRows(docs, "doc_id", "text").cache()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val pairs = sh.toDF("id_a", "s")
      .join(sh.toDF("id_b", "s2"), col("s") === col("s2") && col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("inter"))
      .join(sizes.toDF("id_a", "na"), "id_a")
      .join(sizes.toDF("id_b", "nb"), "id_b")
      .select(
        col("id_a"),
        col("id_b"),
        (col("inter") * lit(1.0) / (col("na") + col("nb") - col("inter"))).as("j"))
      .filter(col("j") >= thr)
    pairs.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  test("signatures are deterministic and one row per doc") {
    val sig = MinHash.signatures(docs, "doc_id", "text")
    assert(sig.count() === docs.count())
    assert(sig.columns.toSet === (Set("doc_id") ++ (0 until MinHash.K).map(i => s"m$i")))
    val a = sig.orderBy("doc_id").collect()
    val b = MinHash.signatures(docs, "doc_id", "text").orderBy("doc_id").collect()
    assert(a.sameElements(b))
  }

  test("LSH near-duplicates find exactly the planted high-jaccard pairs") {
    val truth = exactPairs(0.5)
    assert(truth.nonEmpty, "test data should contain planted near-dup pairs")
    // 8 bands x 2 rows: P(candidate | j>=0.9) = 1-(1-j^2)^8 > 0.9999
    val found = MinHash
      .nearDuplicates(docs, "doc_id", "text", threshold = 0.5, rowsPerBand = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(found === truth, "LSH+rerank must equal the exact quadratic result")
  }

  test("LSH candidate set is much smaller than the quadratic pair space") {
    val n = docs.count()
    val sig = MinHash.signatures(docs, "doc_id", "text")
    val cands = MinHash.lshCandidatePairs(sig, "doc_id", rowsPerBand = 2).count()
    assert(cands < n * (n - 1) / 2 / 10, s"LSH produced $cands candidates for $n docs")
  }

  test("cross-corpus join == self-join pairs restricted to cross pairs (2-row bands)") {
    // 2 rows/band = 8 bands: recall high enough that the planted near-dups
    // all band-collide, so LSH candidates ⊇ truth and the verify stage's
    // exact Jaccard makes the two formulations set-equal.
    val split = col("doc_id") % 2 === 0
    val base = docs.filter(split)
    val incoming = docs.filter(!split)
    val got = MinHash
      .crossCorpusDuplicates(base, incoming, "doc_id", "text", threshold = 0.5, rowsPerBand = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val baseIds = base.select("doc_id").collect().map(_.getLong(0)).toSet
    // truth from the exact quadratic self-join, reoriented (inc, base, j)
    val want = exactPairs(0.5).flatMap { case (a, b, j) =>
      (baseIds(a), baseIds(b)) match {
        case (true, false) => Some((b, a, j))
        case (false, true) => Some((a, b, j))
        case _             => None // same-side pair: not a cross pair
      }
    }
    assert(want.nonEmpty, "fixture must plant near-dups straddling the split")
    assert(got === want, "cross-corpus join must equal the cross-restricted exact result")
  }

  test("incremental pairs == full pairs restricted to delta-involving pairs") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val sig = MinHash.signatures(docs, "doc_id", "text")
    val full = MinHash.lshCandidatePairs(sig, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // delta = every third doc (arbitrary but deterministic)
    val isNew = col("doc_id") % 3 === 0
    val newIds = docs.filter(isNew).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val incr = MinHash.incrementalLshPairs(
      MinHash.bandRows(sig, "doc_id"), sig.filter(isNew), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = full.filter { case (a, b) => newIds(a) || newIds(b) }
    assert(incr === want, "incremental must equal the delta-restricted full pair set")
    assert(want.size < full.size, "fixture must include existing-only pairs to exclude")
  }
}
