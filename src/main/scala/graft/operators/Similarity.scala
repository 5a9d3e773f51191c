package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an `Array[Float]` embedding
  * column.
  *
  * Two paths:
  *   - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline.
  *     One broadcast of the query + one scan; fine for a single query even
  *     at 100 TB (it's a map + takeOrdered), wrong for query BATCHES.
  *   - [[lshBuckets]] / [[annTopK]]: sign-random-projection LSH — vectors
  *     hash to a bucket by the sign pattern of `nPlanes` fixed random
  *     hyperplanes; a query probes only its bucket (and optionally
  *     neighboring buckets), turning the scan into a partition-pruned
  *     lookup. Planes are generated from a fixed seed so bucketing is
  *     deterministic and reproducible across runs/engines.
  */
object Similarity {

  /** embedding as double array + L2 norm, reusable fragment. Cast (not
    * `transform(_.cast)`) and the native [[graft.functions.DotProduct]]
    * kernel keep the whole fragment inside WholeStageCodegen — the
    * higher-order-function formulation is CodegenFallback and interpreted.
    */
  def withNorm(df: DataFrame, embCol: String = "embedding"): DataFrame = {
    val d = df.withColumn("v", col(embCol).cast("array<double>"))
    d.withColumn("norm", sqrt(dot(col("v"), col("v"))))
  }

  def dot(a: Column, b: Column): Column = graft.functions.VectorExprs.dotProduct(a, b)

  /** Exact cosine top-k of `df` vs one query vector (driver-side Seq). */
  def bruteForceTopK(
      df: DataFrame,
      idCol: String,
      query: Seq[Double],
      k: Int): DataFrame = {
    val qNorm = math.sqrt(query.map(x => x * x).sum)
    val qCol = typedLit(query)
    withNorm(df)
      .select(
        col(idCol),
        (dot(col("v"), qCol) / (col("norm") * lit(qNorm))).as("cos"))
      .orderBy(round(col("cos"), 6).desc, col(idCol))
      .limit(k)
  }

  /** Deterministic random hyperplanes: nPlanes x dim, seed-fixed. */
  def planes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Adds a `bucket` column: bit i = sign(v · plane_i). 2^nPlanes buckets.
    * At scale the table is written partitioned/bucketed by this column so a
    * query reads one bucket, not the corpus.
    */
  def lshBuckets(df: DataFrame, nPlanes: Int, dim: Int, seed: Long = 42L): DataFrame = {
    val ps = planes(nPlanes, dim, seed)
    val bits = ps.zipWithIndex.map { case (p, i) =>
      val pCol = typedLit(p)
      when(dot(col("v"), pCol) >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    withNorm(df).withColumn("bucket", bits.reduce(_ + _))
  }

  /** ANN top-k: probe the query's bucket plus all buckets within hamming
    * distance <= 2 (multi-probe keeps recall up without widening the scan
    * much), exact re-rank inside the candidate set.
    */
  def annTopK(
      bucketed: DataFrame,
      idCol: String,
      query: Seq[Double],
      k: Int,
      nPlanes: Int,
      seed: Long = 42L): DataFrame = {
    val ps = planes(nPlanes, query.size, seed)
    val qBucket = ps.zipWithIndex.map { case (p, i) =>
      val d = p.zip(query).map { case (a, b) => a * b }.sum
      if (d >= 0) 1L << i else 0L
    }.sum
    val flips1 = (0 until nPlanes).map(i => qBucket ^ (1L << i))
    val flips2 = for {
      i <- 0 until nPlanes; j <- (i + 1) until nPlanes
    } yield qBucket ^ (1L << i) ^ (1L << j)
    val probe = (qBucket +: (flips1 ++ flips2)).distinct
    val qNorm = math.sqrt(query.map(x => x * x).sum)
    val qCol = typedLit(query)
    bucketed
      .filter(col("bucket").isin(probe.map(_.asInstanceOf[Any]): _*))
      .select(
        col(idCol),
        (dot(col("v"), qCol) / (col("norm") * lit(qNorm))).as("cos"))
      .orderBy(round(col("cos"), 6).desc, col(idCol))
      .limit(k)
  }

  // ------------------------------------------------------------------
  // IVF (inverted-file) index: spherical k-means coarse quantizer.
  // Sign-LSH recall collapses when "neighbors" are near-orthogonal (as in
  // uniform random embeddings); IVF partitions by direction regardless, so
  // it is the default ANN scale path. At 100 TB: train on a driver-side
  // sample, write the table partitioned by `cell`, probe nProbe cells per
  // query — a partition-pruned scan instead of a full pass.
  // ------------------------------------------------------------------

  /** Train k spherical-k-means centroids on a deterministic sample
    * (vectors with id < sampleN; swap for df.sample(seed) on real data).
    */
  def trainIvf(
      df: DataFrame,
      idCol: String,
      k: Int = 16,
      sampleN: Int = 256,
      iters: Int = 8): Seq[Seq[Double]] = {
    val sample = withNorm(df)
      .filter(col(idCol) < sampleN)
      .select(transform(col("v"), x => x / col("norm")).as("u"))
      .collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.length >= k, s"sample ${sample.length} < k=$k")
    var centroids = sample.take(k).map(_.clone())
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](sample.head.length))
      val counts = new Array[Int](k)
      sample.foreach { v =>
        val best = centroids.indices.maxBy(c => dot(v, centroids(c)))
        counts(best) += 1
        var i = 0
        while (i < v.length) { sums(best)(i) += v(i); i += 1 }
      }
      centroids = centroids.indices.map { c =>
        if (counts(c) == 0) centroids(c)
        else {
          val n = math.sqrt(dot(sums(c), sums(c)))
          sums(c).map(_ / n)
        }
      }.toArray
    }
    centroids.map(_.toSeq).toSeq
  }

  /** Distributed spherical-k-means: each iteration is ONE Spark job —
    * assign every vector to its nearest centroid (broadcast literals,
    * native dot_product) and re-estimate centroids with the VectorMean
    * Aggregator (map-side partial sums; the shuffle carries k buffers per
    * partition, never the vectors). This is the 100 TB trainer —
    * [[trainIvf]]'s driver-side sample variant stays for tiny inputs.
    * Initialization: the k lexicographically-first vector ids
    * (deterministic).
    */
  def trainIvfDistributed(
      df: DataFrame,
      idCol: String,
      k: Int = 16,
      iters: Int = 4,
      sampleCap: Int = 262144): Seq[Seq[Double]] = {
    import org.apache.spark.sql.expressions.UserDefinedFunction
    val vmean: UserDefinedFunction = udaf(graft.functions.VectorMean)
    // k-means trains on a BOUNDED sample (the industry-standard coarse-
    // quantizer recipe — the codebook needs representative geometry, not
    // the corpus): limit() takes the first files' rows, deterministic for
    // a stable layout, and the sample is coalesced so each training
    // iteration is a handful of tasks instead of one per corpus
    // partition. ASSIGNMENT (ivfAssign) still runs over the full corpus.
    val unit = withNorm(df)
      .select(col(idCol).as("_id"), transform(col("v"), x => x / col("norm")).as("u"))
      .limit(sampleCap)
      .coalesce(8)
      .cache()
    var centroids: Seq[Seq[Double]] =
      unit.orderBy("_id").limit(k).collect().map(_.getSeq[Double](1).toSeq).toSeq
    for (_ <- 0 until iters) {
      val dots = array(centroids.map(c => dot(col("u"), typedLit(c))): _*)
      val means = unit
        .withColumn("cell", array_position(dots, array_max(dots)) - 1)
        .groupBy("cell")
        .agg(vmean(col("u")).as("m"))
        .collect()
        .map(r => r.getLong(0).toInt -> r.getSeq[Double](1))
        .toMap
      centroids = centroids.indices.map { c =>
        means.get(c) match {
          case Some(m) if m.nonEmpty =>
            val n = math.sqrt(m.map(x => x * x).sum)
            m.map(_ / n)
          case _ => centroids(c)
        }
      }
    }
    unit.unpersist(blocking = false)
    centroids
  }

  /** Adds a `cell` column: argmax_c (v·centroid_c), 0-based. */
  def ivfAssign(df: DataFrame, centroids: Seq[Seq[Double]]): DataFrame =
    // one ArgMaxDot kernel call, not a k-dot array + array_position scan:
    // the expression form inlined k dot loops into whatever stage fuses
    // around it — and the ivfPqTopK probe's pushed-down cell filter
    // SUBSTITUTES the alias, duplicating all k loops into the filter —
    // which pushed the fused method past HotSpot's 8000-byte JIT refusal
    // (the PqEncode failure mode). Same first-argmax cell, bit-exact
    // (SimilaritySpec pins it against the expression form).
    withNorm(df).withColumn(
      "cell", graft.functions.PqExprs.argMaxDot(col("v"), centroids))

  /** IVF ANN top-k: probe the nProbe cells whose centroids are closest to
    * the query, exact cosine re-rank inside them.
    */
  private def ddot(a: Seq[Double], b: Seq[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  /** The nProbe cells whose centroids best align with the query — factored
    * out so the frozen-literal oracle replays the IDENTICAL probe list.
    */
  def probeCells(query: Seq[Double], centroids: Seq[Seq[Double]], nProbe: Int): Seq[Int] = {
    val qn = math.sqrt(ddot(query, query))
    centroids.zipWithIndex
      .sortBy { case (c, _) => -ddot(c, query) / qn }
      .take(nProbe)
      .map(_._2)
  }

  /** IVF-cell-BLOCKED near-duplicate pairs — the unblocked-corpus scale
    * path for embedding dedup (q_dedup_embed_cosine's label blocking
    * assumes a blocking key exists; this derives one from the geometry).
    * Every vector is assigned to its 2 best cells (multi-probe: a pair
    * straddling one cell boundary still collides in the other
    * assignment), pairs form only within shared cells, and exact cosine
    * filters them. Candidate work is Σ_cells occupancy² instead of n² —
    * at 100 TB the assigned table is written partitioned by cell and
    * each cell's pair join runs partition-local. Recall is blocked-
    * candidate recall (high for near-dups: argmax cells agree when
    * directions nearly agree), not exhaustive — the exact baseline
    * stays q_dedup_embed_cosine.
    *
    * Assignment parity contract (mirrored in the frozen-literal oracle):
    * cell1 = FIRST argmax of the centroid dots, cell2 = first argmax
    * after masking cell1's slot with -1e18 (exactly representable, below
    * any real dot product).
    */
  def ivfBlockedPairs(
      df: DataFrame,
      idCol: String,
      centroids: Seq[Seq[Double]],
      threshold: Double): DataFrame = {
    val normed = withNorm(df)
    val dots = array(centroids.map(c => dot(col("v"), typedLit(c))): _*)
    // persist the assignment: the k-dot argmax per row is the expensive
    // fragment and it feeds BOTH sides of the pair join — the in-memory
    // analog of the at-scale layout (assignment written partitioned by
    // cell, pair join partition-local). Serialized blocks spill to disk;
    // released after the eager materialization below.
    val withCells = normed
      .withColumn("dots", dots)
      .withColumn("c1", array_position(col("dots"), array_max(col("dots"))).cast("int"))
      .withColumn(
        "dots2",
        transform(col("dots"), (x, i) => when(i === col("c1") - 1, lit(-1e18)).otherwise(x)))
      .withColumn("c2", array_position(col("dots2"), array_max(col("dots2"))).cast("int"))
      .select(
        col(idCol),
        col("v"),
        col("norm"),
        explode(array(col("c1") - 1, col("c2") - 1)).as("cell"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val out = withCells.as("a")
      .join(
        withCells.as("b"),
        col("a.cell") === col("b.cell") && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(
        col(s"a.$idCol").as("id_a"),
        col(s"b.$idCol").as("id_b"),
        round(dot(col("a.v"), col("b.v")) / (col("a.norm") * col("b.norm")), 3).as("cos"))
      .filter(col("cos") >= threshold)
      .distinct()
      // eager: the pair table is O(candidates over threshold) — small next
      // to the corpus — and materializing it here lets the assignment
      // cache release instead of leaking past return
      .localCheckpoint()
    withCells.unpersist(blocking = false)
    out
  }

  /** SemDeDup (Abbas et al., arXiv:2303.09540) — SEMANTIC dedup over an
    * embedding column: k-means cells block the corpus, and inside each
    * cell a document is DROPPED when any lower-id neighbor sits above
    * the cosine threshold (keep-first, the deterministic stand-in for
    * the paper's per-group single survivor). The per-item rule (not
    * connected components) matches the reference implementation: each
    * item checks its own neighborhood once, no transitive chaining, so
    * the decision is one within-cell join — Σ_cells occupancy²
    * candidate work, never n². At 100 TB the assignment is written
    * partitioned by cell and each cell's pair join runs partition-local
    * (same layout as [[ivfBlockedPairs]]); dedup rates then tune by
    * threshold, the paper's main knob.
    *
    * Returns every input id with its cell and a `kept` verdict —
    * downstream either filters `kept` or audits the drop rate per cell.
    * Cosines round to 6 decimals before the comparison so the verdict
    * is reproducible across engines (the [[graft.operators.Mmr]]
    * contract).
    *
    * THE k-VS-CORPUS CONTRACT (the [[InvertedIndex.NumBuckets]]
    * discipline): `centroids.size` is the caller's scaling knob, and
    * the within-cell pair join costs Σ_cells occupancy². With balanced
    * cells that is n²/k, so k must GROW with the corpus — k ≈ n/c for
    * a target mean cell occupancy c keeps per-cell work at c·n
    * regardless of scale (the paper runs k = 11k cells over 1.1B
    * embeddings for the same reason: ~100k-item cells, never
    * whole-corpus pairs). k is a call-time argument, not a schema
    * commitment — re-run with a larger k as the corpus grows; verdicts
    * at the same threshold stay semantically comparable (cells only
    * block the candidate space). A skewed embedding space concentrates
    * occupancy regardless of k; re-train centroids on a fresh sample
    * (Similarity.kmeans) when a cell's occupancy² dominates the join
    * (observable per cell from this function's own output).
    */
  def semDedup(
      df: DataFrame,
      idCol: String,
      centroids: Seq[Seq[Double]],
      threshold: Double): DataFrame = {
    val normed = withNorm(df)
    val dots = array(centroids.map(c => dot(col("v"), typedLit(c))): _*)
    // 1-probe: SemDeDup clusters partition the corpus (first argmax —
    // the same tie rule the frozen-literal oracle replays).
    // The assignment is persisted: the k-dot argmax is the expensive
    // per-row fragment and it feeds THREE consumers (both pair-join
    // sides — one via exchange reuse — and the verdict join below);
    // un-cached, the verdict join recomputes the whole argmax pass.
    // In-memory analog of the at-scale layout (assignment written
    // partitioned by cell); serialized blocks spill to disk, released
    // after the eager materialization below.
    val assigned = normed
      .withColumn("dots", dots)
      .withColumn(
        "cell",
        (array_position(col("dots"), array_max(col("dots"))) - 1).cast("int"))
      .select(col(idCol), col("v"), col("norm"), col("cell"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val dropped = assigned.as("a")
      .join(
        assigned.as("b"),
        col("a.cell") === col("b.cell") && col(s"a.$idCol") < col(s"b.$idCol"))
      .filter(
        round(dot(col("a.v"), col("b.v")) / (col("a.norm") * col("b.norm")), 6)
          >= threshold)
      .select(col(s"b.$idCol").as(idCol))
      .distinct()
    val out = assigned
      .join(dropped.withColumn("_dup", lit(true)), Seq(idCol), "left")
      .select(
        col(idCol),
        col("cell"),
        not(coalesce(col("_dup"), lit(false))).as("kept"))
      // eager: the verdict table is 3 narrow columns per doc; material-
      // izing it here lets the assignment cache release at return
      .localCheckpoint()
    assigned.unpersist(blocking = false)
    out
  }

  def ivfTopK(
      assigned: DataFrame,
      idCol: String,
      query: Seq[Double],
      k: Int,
      centroids: Seq[Seq[Double]],
      nProbe: Int = 4): DataFrame = {
    val qn = math.sqrt(ddot(query, query))
    val probeCells = this.probeCells(query, centroids, nProbe)
    val qCol = typedLit(query)
    assigned
      .filter(col("cell").isin(probeCells.map(_.asInstanceOf[Any]): _*))
      .select(
        col(idCol),
        (dot(col("v"), qCol) / (col("norm") * lit(qn))).as("cos"))
      .orderBy(round(col("cos"), 6).desc, col(idCol))
      .limit(k)
  }
}
