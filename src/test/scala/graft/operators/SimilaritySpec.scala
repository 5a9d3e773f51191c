package graft.operators

import graft.SparkSpec
import graft.engine.Session
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  private lazy val emb = Session.table(spark, sf, "embeddings")

  private def queryVec(id: Long): Seq[Double] =
    Similarity.withNorm(emb).filter(col("vec_id") === id)
      .select("v").head().getSeq[Double](0).toSeq

  test("ArgMaxDot cell assignment is bit-identical to the expression form") {
    import org.apache.spark.sql.functions._
    // the pre-kernel formulation ivfAssign replaced, verbatim
    def assignExprForm(df: org.apache.spark.sql.DataFrame, cents: Seq[Seq[Double]]) = {
      val dots = array(cents.map(c => Similarity.dot(col("v"), typedLit(c))): _*)
      Similarity.withNorm(df)
        .withColumn("cell_dots", dots)
        .withColumn("cell",
          (array_position(col("cell_dots"), array_max(col("cell_dots"))) - 1).cast("int"))
        .drop("cell_dots")
    }
    val cents = Similarity.trainIvfDistributed(
      Similarity.withNorm(emb), "vec_id", k = 16, iters = 2)
    val kernel = Similarity.ivfAssign(emb, cents)
      .select("vec_id", "cell").orderBy("vec_id").collect()
    val exprs = assignExprForm(emb, cents)
      .select("vec_id", "cell").orderBy("vec_id").collect()
    assert(kernel.sameElements(exprs))
    // tie parity: duplicate centroids dot equally — both pick the FIRST;
    // short and empty vectors dot over the available prefix; null is null
    val w = Seq(0.5, -0.5, 0.25)
    val tieCents = Seq(Seq(9.0, 9.0, 9.0).map(-_), w, w)
    val edge = spark.createDataFrame(Seq(
      (1L, Seq(0.5, -0.5, 0.25)),
      (2L, Seq(0.1)),
      (3L, Seq.empty[Double])
    )).toDF("vec_id", "embedding")
    val edgeNull = edge.unionByName(
      spark.createDataFrame(Seq(Tuple1(4L))).toDF("vec_id")
        .withColumn("embedding", lit(null).cast("array<double>")))
    val ek = Similarity.ivfAssign(edgeNull, tieCents)
      .select("vec_id", "cell").orderBy("vec_id").collect()
    val ee = assignExprForm(edgeNull, tieCents)
      .select("vec_id", "cell").orderBy("vec_id").collect()
    assert(ek.sameElements(ee))
    assert(ek.head.getInt(1) == 1) // first of the two tied best centroids
  }

  test("brute-force top-k returns k rows in non-increasing cosine order") {
    val q = queryVec(0)
    val top = Similarity.bruteForceTopK(emb.filter(col("vec_id") =!= 0), "vec_id", q, 10)
      .collect()
    assert(top.length === 10)
    val scores = top.map(_.getDouble(1))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("IVF ANN recall@10 vs brute force is acceptable") {
    val q = queryVec(0)
    val rest = emb.filter(col("vec_id") =!= 0)
    val truth = Similarity.bruteForceTopK(rest, "vec_id", q, 10)
      .collect().map(_.getLong(0)).toSet
    val centroids = Similarity.trainIvf(emb, "vec_id", k = 16)
    val assigned = Similarity.ivfAssign(rest, centroids).cache()
    val got = Similarity.ivfTopK(assigned, "vec_id", q, 10, centroids, nProbe = 6)
      .collect().map(_.getLong(0)).toSet
    val recall = (truth intersect got).size / 10.0
    assert(recall >= 0.5, s"IVF recall=$recall truth=$truth got=$got")
  }

  test("distributed IVF training reaches comparable recall to sampled training") {
    val q = queryVec(0)
    val rest = emb.filter(col("vec_id") =!= 0)
    val truth = Similarity.bruteForceTopK(rest, "vec_id", q, 10)
      .collect().map(_.getLong(0)).toSet
    val centroids = Similarity.trainIvfDistributed(emb, "vec_id", k = 16, iters = 4)
    assert(centroids.length === 16)
    // every centroid is unit-norm
    centroids.foreach { c =>
      assert(math.abs(math.sqrt(c.map(x => x * x).sum) - 1.0) < 1e-9)
    }
    val assigned = Similarity.ivfAssign(rest, centroids).cache()
    val got = Similarity.ivfTopK(assigned, "vec_id", q, 10, centroids, nProbe = 6)
      .collect().map(_.getLong(0)).toSet
    val recall = (truth intersect got).size / 10.0
    assert(recall >= 0.5, s"distributed-IVF recall=$recall")
  }

  test("sign-LSH ANN returns plausible candidates (recall is data-dependent)") {
    // uniform random embeddings have near-orthogonal "neighbors" (max cos
    // ~0.4), the worst case for sign-LSH — we assert mechanics (k results
    // from probed buckets, ordered), not recall; IVF is the recall path.
    val q = queryVec(0)
    val rest = emb.filter(col("vec_id") =!= 0)
    val bucketed = Similarity.lshBuckets(rest, nPlanes = 8, dim = 64).cache()
    val got = Similarity.annTopK(bucketed, "vec_id", q, 10, nPlanes = 8).collect()
    assert(got.length === 10)
    val scores = got.map(_.getDouble(1))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("bucketing assigns every vector to exactly one bucket") {
    val bucketed = Similarity.lshBuckets(emb, nPlanes = 8, dim = 64)
    assert(bucketed.count() === emb.count())
    val nBuckets = bucketed.select("bucket").distinct().count()
    assert(nBuckets > 1 && nBuckets <= 256)
  }

  test("ivfBlockedPairs: sound vs brute force; identical vectors always collide") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    // plant an exact duplicate of vector 3 under a fresh id: identical
    // direction ⇒ identical argmax cells ⇒ the blocked join MUST pair them
    val dup = emb.filter(col("vec_id") === 3)
      .select(lit(999999L).as("vec_id"), col("embedding"), col("label"))
    val corpus = emb.unionByName(dup)
    val cents = Similarity.trainIvfDistributed(corpus, "vec_id", k = 16, iters = 2)
    val got = Similarity.ivfBlockedPairs(corpus, "vec_id", cents, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.exists { case (a, b, c) => a == 3L && b == 999999L && c == 1.0 },
      "planted exact duplicate must be found with cos 1.0")
    // soundness: every reported pair really is >= threshold by direct check
    val byId = Similarity.withNorm(corpus)
      .select(col("vec_id"), col("v"), col("norm")).collect()
      .map(r => r.getLong(0) -> (r.getSeq[Double](1), r.getDouble(2))).toMap
    got.foreach { case (a, b, c) =>
      val (va, na) = byId(a); val (vb, nb) = byId(b)
      val cos = va.zip(vb).map(p => p._1 * p._2).sum / (na * nb)
      assert(math.abs(cos - c) < 5e-4, s"reported cos must match direct: $a,$b")
      assert(c >= 0.4)
    }
    // no duplicate pair rows despite 2-probe double assignment
    assert(got.map(p => (p._1, p._2)).distinct.length === got.length)
  }

  test("semDedup: keep-first inside cells, every doc verdicted, planted dup dropped") {
    val s = spark
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    // an exact duplicate of vector 3 under a HIGHER id: same direction ⇒
    // same argmax cell ⇒ keep-first must keep 3 and drop the clone
    val dup = emb.filter(col("vec_id") === 3)
      .select(lit(999999L).as("vec_id"), col("embedding"), col("label"))
    val corpus = emb.unionByName(dup)
    val cents = Similarity.trainIvfDistributed(corpus, "vec_id", k = 16, iters = 2)
    val out = Similarity.semDedup(corpus, "vec_id", cents, threshold = 0.4)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2))).toMap
    assert(out.size === corpus.count(), "one verdict per input doc")
    assert(out(3L)._2, "the original survives (no lower-id neighbor that close)")
    assert(!out(999999L)._2, "the planted exact duplicate must be dropped")
    assert(out(3L)._1 === out(999999L)._1, "identical direction ⇒ identical cell")
    // keep-first is per-cell sound: a dropped doc has a kept-or-dropped
    // lower-id neighbor over the threshold in ITS OWN cell (verified
    // against the direct cosine)
    val byId = Similarity.withNorm(corpus)
      .select(col("vec_id"), col("v"), col("norm")).collect()
      .map(r => r.getLong(0) -> (r.getSeq[Double](1), r.getDouble(2))).toMap
    out.filter(!_._2._2).foreach { case (id, (cell, _)) =>
      val (v, n) = byId(id)
      val hasCloseLower = out.exists { case (o, (c2, _)) =>
        o < id && c2 == cell && {
          val (v2, n2) = byId(o)
          v.zip(v2).map(p => p._1 * p._2).sum / (n * n2) >= 0.4 - 1e-6
        }
      }
      assert(hasCloseLower, s"dropped $id must have a close lower-id cellmate")
    }
  }

  test("semDedup k-vs-corpus contract: raising k bounds per-cell pair work on skew") {
    val s = spark
    import org.apache.spark.sql.functions._
    // a SKEWED space: most vectors point near one direction (the shape
    // that concentrates cell occupancy), plus a dispersed remainder
    val skew = spark.range(0, 2000).select(
      col("id").as("vec_id"),
      array(
        (lit(1.0) + col("id") % 7 / lit(1000.0)),
        (col("id") % 13) / lit(100.0),
        when(col("id") % 5 === 0, col("id") % 17 / lit(10.0)).otherwise(lit(0.01)))
        .as("embedding"))
    def pairWork(k: Int): (Long, Long) = {
      val cents = Similarity.trainIvfDistributed(skew, "vec_id", k = k, iters = 2)
      val occ = Similarity.semDedup(skew, "vec_id", cents, threshold = 0.999999)
        .groupBy("cell").agg(count(lit(1)).as("n"))
        .collect().map(_.getLong(1))
      (occ.map(n => n * n).sum, occ.max)
    }
    val (work4, max4) = pairWork(4)
    val (work32, max32) = pairWork(32)
    // the operator's cost is Σ occupancy² — the caller's k is the knob
    // that keeps it linear-ish as the corpus grows (the documented
    // contract): more cells must strictly shrink both the total pair
    // work and the worst cell on this skewed fixture
    assert(work32 < work4,
      s"k=32 must cut total pair work on skew: $work32 !< $work4")
    assert(max32 < max4,
      s"k=32 must cut the worst cell's occupancy: $max32 !< $max4")
    assert(work32 <= 4L * 2000L * (2000L / 32L + 1L),
      "pair work stays within a small multiple of n * mean-occupancy")
  }
}
