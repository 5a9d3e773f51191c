package graft.queries

import graft.QueryDef
import graft.QueryDef.t
import graft.operators.{Similarity => Sim}
import org.apache.spark.sql.functions._

/** Similarity-search queries over `embeddings`. Every ANN variant is fully
  * oracle-checked despite being "approximate": the index parameters are
  * frozen as literals into the generated DuckDB SQL — seed-deterministic
  * ones (LSH planes, PQ codebooks) at class init, data-TRAINED ones (the
  * IVF k-means centroids) late-bound after the query fn runs (IvfState +
  * QueryDef.oracleDyn). Recall quality is separately asserted against the
  * brute-force answer in SimilaritySpec.
  */
object Similarity {

  /** Frozen IVF model for the late-bound q_knn_ivf oracle: the query fn
    * deposits the centroids it trained and the probe list it derived; the
    * oracle renderer replays cell assignment (first-argmax over the same
    * sequential-sum dot products — bit-identical in both engines), the
    * literal probe filter, and the exact cosine re-rank.
    */
  private[queries] object IvfState {
    @volatile private var state: Option[(Seq[Seq[Double]], Seq[Int])] = None

    def freeze(query: Seq[Double], centroids: Seq[Seq[Double]], nProbe: Int): Unit =
      state = Some((centroids, Sim.probeCells(query, centroids, nProbe)))

    def oracleSql: Option[String] = state.map { case (centroids, probe) =>
      ivfOracleSql(centroids, probe)
    }
  }

  /** DuckDB replay of IVF assign + probe + exact re-rank from frozen
    * centroid/probe literals. Shared by the per-query IVF path (q_knn_ivf)
    * and the persisted-index path (q_knn_ivf_persisted): the cell of a
    * vector depends only on the frozen centroid literals (first-argmax
    * over the same sequential-sum dot products), so whether Spark assigned
    * it at build time or at delta-append time is invisible to the oracle —
    * exactly the invariant the persisted index must keep.
    */
  private def ivfOracleSql(centroids: Seq[Seq[Double]], probe: Seq[Int]): String = {
    val dots = centroids
      .map(c => s"list_dot_product(v, ${c.map(String.valueOf).mkString("[", ", ", "]")})")
      .mkString("[\n      ", ",\n      ", "]")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |q AS (SELECT v AS qv, sqrt(list_dot_product(v, v)) AS qn FROM e WHERE vec_id = 0),
       |a AS (
       |  SELECT vec_id, v,
       |    CAST(list_position(dots, list_aggregate(dots, 'max')) - 1 AS INT) AS cell
       |  FROM (SELECT vec_id, v, $dots AS dots FROM e WHERE vec_id != 0)),
       |scored AS (
       |  SELECT a.vec_id,
       |    list_dot_product(a.v, q.qv) / (sqrt(list_dot_product(a.v, a.v)) * q.qn) AS cos
       |  FROM a, q
       |  WHERE cell IN (${probe.mkString(", ")}))
       |SELECT vec_id, round(cos, 3) AS cos FROM scored
       |ORDER BY round(cos, 6) DESC, vec_id LIMIT 10""".stripMargin
  }

  /** Frozen model for the late-bound q_knn_ivf_persisted oracle. */
  private[queries] object IvfPersistedState {
    @volatile private var state: Option[(Seq[Seq[Double]], Seq[Int])] = None

    def freeze(query: Seq[Double], centroids: Seq[Seq[Double]], nProbe: Int): Unit =
      state = Some((centroids, Sim.probeCells(query, centroids, nProbe)))

    def oracleSql: Option[String] = state.map { case (centroids, probe) =>
      ivfOracleSql(centroids, probe)
    }
  }

  /** Frozen IVF-PQ model for the late-bound q_knn_ivfpq oracle: trained
    * coarse centroids + derived probe list (the PQ codebooks are
    * class-init deterministic, rendered directly). The oracle replays
    * cell assignment, the probe filter, PQ encoding, the ADC lookup-table
    * scan and the exact re-rank from identical literals.
    */
  /** DuckDB replay of the four-stage IVF-PQ plan (assign + probe + ADC
    * over codes + exact re-rank) from frozen centroid/probe literals and
    * the class-init seeded codebooks. Shared by the in-query composition
    * (q_knn_ivfpq) and the persisted index (q_knn_ivfpq_persisted): a
    * vector's cell and codes are pure functions of the frozen model, so
    * whether Spark computed them per query or at build/append time is
    * invisible to the oracle — the invariant the persisted index keeps.
    */
  private def ivfPqOracleSql(centroids: Seq[Seq[Double]], probe: Seq[Int]): String = {
    val b = graft.operators.Pq.seededBooks(64)
    val dots = centroids
      .map(c => s"list_dot_product(v, ${c.map(String.valueOf).mkString("[", ", ", "]")})")
      .mkString("[\n      ", ",\n      ", "]")
    val luts = (0 until b.m)
      .map { j =>
        val ls = (0 until b.ksub)
          .map(c => graft.operators.Pq.subDistSql("qv", j, b.books(j)(c), b.dsub))
        s"[${ls.mkString(",\n      ")}] AS l$j"
      }
      .mkString(",\n    ")
    val adcSum = (0 until b.m).map(j => s"lut.l$j[c.code$j + 1]").mkString(" + ")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |${graft.operators.Pq.encodeOracleCte(b)},
       |q AS (SELECT v AS qv, sqrt(list_dot_product(v, v)) AS qn FROM e WHERE vec_id = 0),
       |a AS (
       |  SELECT vec_id, CAST(list_position(dots, list_aggregate(dots, 'max')) - 1 AS INT) AS cell
       |  FROM (SELECT vec_id, $dots AS dots FROM e WHERE vec_id != 0)),
       |lut AS (
       |  SELECT qv, qn,
       |    $luts
       |  FROM q),
       |scored AS (
       |  SELECT c.vec_id, c.v, round($adcSum, 6) AS adc
       |  FROM enc c JOIN a USING (vec_id), lut
       |  WHERE a.cell IN (${probe.mkString(", ")})),
       |cand AS (SELECT vec_id, v FROM scored ORDER BY adc ASC, vec_id LIMIT 40),
       |rer AS (
       |  SELECT cand.vec_id,
       |    round(list_dot_product(cand.v, lut.qv) /
       |      (sqrt(list_dot_product(cand.v, cand.v)) * lut.qn), 6) AS cos
       |  FROM cand, lut)
       |SELECT vec_id, round(cos, 3) AS cos FROM rer
       |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin
  }

  private[queries] object IvfPqState {
    @volatile private var state: Option[(Seq[Seq[Double]], Seq[Int])] = None

    def freeze(query: Seq[Double], centroids: Seq[Seq[Double]], nProbe: Int): Unit =
      state = Some((centroids, Sim.probeCells(query, centroids, nProbe)))

    def oracleSql: Option[String] = state.map { case (centroids, probe) =>
      ivfPqOracleSql(centroids, probe)
    }
  }

  /** Frozen model for the late-bound q_knn_ivfpq_persisted oracle. */
  private[queries] object IvfPqPersistedState {
    @volatile private var state: Option[(Seq[Seq[Double]], Seq[Int])] = None

    def freeze(query: Seq[Double], centroids: Seq[Seq[Double]], nProbe: Int): Unit =
      state = Some((centroids, Sim.probeCells(query, centroids, nProbe)))

    def oracleSql: Option[String] = state.map { case (centroids, probe) =>
      ivfPqOracleSql(centroids, probe)
    }
  }

  /** Frozen coarse centroids for the late-bound q_dedup_embed_ivf oracle:
    * replays 2-probe cell assignment (first argmax; first argmax after
    * masking with -1e18), within-cell pairing, exact cosine filter.
    */
  private[queries] object EmbedIvfDedupState {
    @volatile private var cents: Option[Seq[Seq[Double]]] = None

    def freeze(centroids: Seq[Seq[Double]]): Unit = cents = Some(centroids)

    def oracleSql: Option[String] = cents.map { centroids =>
      val k = centroids.size
      val dots = centroids
        .map(c => s"list_dot_product(v, ${c.map(String.valueOf).mkString("[", ", ", "]")})")
        .mkString("[\n      ", ",\n      ", "]")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
         |  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
         |  FROM embeddings),
         |d AS (SELECT vec_id, v, nrm, $dots AS dots FROM e),
         |a1 AS (
         |  SELECT vec_id, v, nrm, dots,
         |    CAST(list_position(dots, list_aggregate(dots, 'max')) AS INT) AS c1
         |  FROM d),
         |a2 AS (
         |  SELECT vec_id, v, nrm, c1,
         |    CAST(list_position(dots2, list_aggregate(dots2, 'max')) AS INT) AS c2
         |  FROM (SELECT vec_id, v, nrm, c1,
         |          [CASE WHEN i = c1 THEN -1e18 ELSE dots[i] END
         |           for i in range(1, ${k + 1})] AS dots2
         |        FROM a1)),
         |asg AS (SELECT vec_id, v, nrm, unnest([c1 - 1, c2 - 1]) AS cell FROM a2)
         |SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
         |  round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 3) AS cos
         |FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |WHERE round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 3) >= 0.4""".stripMargin
    }
  }

  /** Frozen centroids for the late-bound q_semdedup oracle: replays the
    * 1-probe assignment (first argmax) and the keep-first drop rule.
    */
  private[queries] object SemDedupState {
    @volatile private var cents: Option[Seq[Seq[Double]]] = None

    def freeze(centroids: Seq[Seq[Double]]): Unit = cents = Some(centroids)

    def oracleSql: Option[String] = cents.map { centroids =>
      val dots = centroids
        .map(c => s"list_dot_product(v, ${c.map(String.valueOf).mkString("[", ", ", "]")})")
        .mkString("[\n      ", ",\n      ", "]")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
         |  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
         |  FROM embeddings),
         |d AS (SELECT vec_id, v, nrm, $dots AS dots FROM e),
         |asg AS (
         |  SELECT vec_id, v, nrm,
         |    CAST(list_position(dots, list_aggregate(dots, 'max')) - 1 AS INT) AS cell
         |  FROM d),
         |dup AS (
         |  SELECT DISTINCT b.vec_id
         |  FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  WHERE round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= 0.4)
         |SELECT asg.vec_id, asg.cell,
         |  asg.vec_id NOT IN (SELECT vec_id FROM dup) AS kept
         |FROM asg""".stripMargin
    }
  }

  // ------------------------------------------------------------------
  // One-time persisted-index fixtures: at 100 TB the ANN index EXISTS
  // (built once, maintained by delta) — a query that re-trains and
  // re-commits it per run measures the build, not the probe it
  // showcases. Bench's warm-up pays the build (the ensureBucketedFacts
  // bargain); in-body calls are memoized no-ops. The trained centroids
  // ride the memo so the late-bound oracles freeze the exact model the
  // probed index holds. Temp dirs reclaimed on JVM exit.
  // ------------------------------------------------------------------
  private val annIdx =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Seq[Seq[Double]])]()

  private def annFixture(
      s: org.apache.spark.sql.SparkSession,
      dir: String,
      kind: String)(build: String => Seq[Seq[Double]]): (String, Seq[Seq[Double]]) =
    annIdx.computeIfAbsent(s"$kind|$dir", { _ =>
      val idxDir = java.nio.file.Files.createTempDirectory(s"graft_ann_$kind").toString
      val cents = build(idxDir)
      val root = new java.io.File(idxDir)
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm))
          f.delete(): Unit
        }
        rm(root)
      }))
      (idxDir, cents)
    })

  /** Persisted IVF index over the corpus: built on the odd half, the
    * even half delta-appended — two commits, exercising the maintenance
    * path the index exists for.
    */
  private def persistedIvf(
      s: org.apache.spark.sql.SparkSession,
      dir: String): (String, Seq[Seq[Double]]) =
    annFixture(s, dir, "ivf") { idxDir =>
      val corpus = t(s, dir, "embeddings").filter(col("vec_id") =!= 0)
      val cents = graft.operators.IvfIndex.build(
        corpus.filter(col("vec_id") % 2 === 1), "vec_id", idxDir, k = 16, iters = 4)
      graft.operators.IvfIndex.append(
        corpus.filter(col("vec_id") % 2 === 0), "vec_id", idxDir)
      cents
    }

  /** Persisted IVF-PQ index, same two-commit shape. */
  private def persistedIvfPq(
      s: org.apache.spark.sql.SparkSession,
      dir: String): (String, Seq[Seq[Double]]) =
    annFixture(s, dir, "ivfpq") { idxDir =>
      val b = graft.operators.Pq.seededBooks(64)
      val corpus = t(s, dir, "embeddings").filter(col("vec_id") =!= 0)
      val cents = graft.operators.IvfIndex.buildPq(
        corpus.filter(col("vec_id") % 2 === 1), "vec_id", idxDir, b, k = 16, iters = 4)
      graft.operators.IvfIndex.append(
        corpus.filter(col("vec_id") % 2 === 0), "vec_id", idxDir)
      cents
    }

  /** Bench warm-up entry: pay both persisted-index builds before any
    * query is timed.
    */
  def ensureAnnIndexes(s: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    persistedIvf(s, dir): Unit
    persistedIvfPq(s, dir): Unit
  }

  val defs: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    // Brute-force cosine top-10 vs the vec_id=0 vector. Both engines do the
    // dot product in double; ordering uses round(cos, 6) + id tie-break so
    // last-ulp noise can't reorder the cut line.
    QueryDef(
      "q_knn_brute",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val q = Sim.withNorm(e).filter(col("vec_id") === 0)
          .select(col("v").as("qv"), col("norm").as("qnorm"))
        Sim.withNorm(e)
          .filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(q))
          .select(
            col("vec_id"),
            round(Sim.dot(col("v"), col("qv")) / (col("norm") * col("qnorm")), 6)
              .as("cos"))
          .orderBy(col("cos").desc, col("vec_id"))
          .limit(10)
          .select(col("vec_id"), round(col("cos"), 3).as("cos"))
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
             |scored AS (
             |  SELECT e.vec_id,
             |    round(list_dot_product(e.v, q.qv) /
             |      (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos
             |  FROM e, q WHERE e.vec_id != 0)
             |SELECT vec_id, round(cos, 3) AS cos FROM scored
             |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin),
      covers = Seq("ext-knn-brute")),

    // ------------------------------------------------------------------
    // LSH-bucketed ANN top-10. Fully oracle-checked even though the index
    // is "approximate": the hyperplanes are seed-deterministic
    // (Similarity.planes), so the same plane literals are generated into
    // the DuckDB SQL and the multi-probe set (hamming distance <= 2 from
    // the query's bucket, annTopK's explicit flip enumeration) becomes
    // `bit_count(xor(bucket, qbucket)) <= 2` — identical candidates,
    // identical scores. Demonstrates the 100 TB path: bucket once, probe
    // O(nPlanes²) buckets per query.
    QueryDef(
      "q_knn_lsh",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val dim = 64
        val query = Sim.withNorm(e).filter(col("vec_id") === 0)
          .select(col("v")).head().getSeq[Double](0)
        val bucketed = Sim.lshBuckets(e.filter(col("vec_id") =!= 0), nPlanes = 8, dim = dim)
        Sim.annTopK(bucketed, "vec_id", query, k = 10, nPlanes = 8)
          .select(col("vec_id"), round(col("cos"), 3).as("cos"))
      },
      Some {
        val ps = Sim.planes(nPlanes = 8, dim = 64)
        def bucketExpr(vcol: String): String = ps.zipWithIndex
          .map { case (p, i) =>
            val lits = p.map(String.valueOf).mkString("[", ", ", "]")
            s"CASE WHEN list_dot_product($vcol, $lits) >= 0 THEN ${1L << i} ELSE 0 END"
          }
          .mkString("(", "\n     + ", ")")
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
           |qb AS (SELECT ${bucketExpr("qv")} AS qbucket FROM q),
           |b AS (
           |  SELECT vec_id, v, ${bucketExpr("v")} AS bucket
           |  FROM e WHERE vec_id != 0),
           |scored AS (
           |  SELECT b.vec_id,
           |    list_dot_product(b.v, q.qv) /
           |      (sqrt(list_dot_product(b.v, b.v)) * sqrt(list_dot_product(q.qv, q.qv))) AS cos
           |  FROM b, q, qb
           |  WHERE bit_count(xor(b.bucket, qb.qbucket)) <= 2)
           |SELECT vec_id, round(cos, 3) AS cos FROM scored
           |ORDER BY round(cos, 6) DESC, vec_id LIMIT 10""".stripMargin
      },
      covers = Seq("ext-knn-lsh")),

    // ------------------------------------------------------------------
    // Per-label centroid, long form: posexplode + avg per (label, dim) —
    // partial aggregation makes the shuffle carry one (sum, count) per
    // group per partition, never the vectors. The array-form equivalent
    // via the custom VectorMean Aggregator is asserted against this in
    // VectorMeanSpec.
    QueryDef(
      "q_embed_centroid",
      (s, dir) =>
        t(s, dir, "embeddings")
          .select(
            col("label"),
            posexplode(col("embedding").cast("array<double>")).as(Seq("dim", "v")))
          .groupBy("label", "dim")
          .agg(round(avg("v"), 6).as("avg_v")),
      Some("""SELECT label, CAST(i - 1 AS INT) AS dim, round(avg(v), 6) AS avg_v
             |FROM (SELECT label, unnest(embedding::DOUBLE[]) AS v,
             |        generate_subscripts(embedding::DOUBLE[], 1) AS i
             |      FROM embeddings)
             |GROUP BY 1, 2""".stripMargin),
      covers = Seq("ext-centroid", "2.10")),

    // ------------------------------------------------------------------
    // L2-normalize + int8 quantization, long form — the storage-compression
    // pass before ANN indexing (4× smaller than float32, 8× than float64).
    // q = round(x/‖v‖ · 127): the normalize-then-scale op tree is identical
    // IEEE arithmetic in both engines, and round-half-away-from-zero at
    // integer grain agrees between Spark HALF_UP and DuckDB. Row-level
    // projection: zero shuffles, scale-free.
    QueryDef(
      "q_embed_quantize",
      (s, dir) => {
        import graft.functions.VectorExprs.dotProduct
        t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
          .withColumn("norm", sqrt(dotProduct(col("v"), col("v"))))
          .filter(col("norm") > 0)
          .select(
            col("vec_id"),
            col("norm"),
            posexplode(col("v")).as(Seq("dim", "x")))
          .select(
            col("vec_id"),
            col("dim"),
            round(col("x") / col("norm") * lit(127.0), 0).cast("int").as("q"))
      },
      Some("""WITH e AS (
             |  SELECT vec_id, embedding::DOUBLE[] AS v,
             |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
             |  FROM embeddings)
             |SELECT vec_id, CAST(i - 1 AS INT) AS dim,
             |  CAST(round(x / norm * 127.0, 0) AS INT) AS q
             |FROM (SELECT vec_id, norm, unnest(v) AS x,
             |        generate_subscripts(v, 1) AS i
             |      FROM e)
             |WHERE norm > 0""".stripMargin),
      covers = Seq("ext-embed-quantize")),

    // ------------------------------------------------------------------
    // IVF ANN top-10: spherical-k-means cells, probe the 6 nearest of 16.
    // Fully oracle-checked even though the index is DATA-trained: the fn
    // freezes the centroids it trained (and the probe-cell list it derived)
    // into [[IvfState]], and the late-bound oracle renders them as DuckDB
    // literals — the same freeze-the-model trick as the LSH planes and PQ
    // codebooks, just bound after training instead of at class init. Cell
    // assignment replays bit-identically: both engines compute the 16 dot
    // products with a sequential left-to-right sum and take the FIRST
    // argmax (array_position / list_position).
    QueryDef(
      "q_knn_ivf",
      (s, dir) => {
        // normalized vectors cached once: the query-vector lookup, trainer
        // sample and cell-probe scan are separate jobs over the same frame
        val e = Sim.withNorm(t(s, dir, "embeddings")).cache()
        val query = e.filter(col("vec_id") === 0)
          .select(col("v")).head().getSeq[Double](0).toSeq
        // the DISTRIBUTED trainer — per-iteration assign + VectorMean
        // partial-agg, the shuffle carries k buffers per partition, never
        // vectors — so the oracle-graded query exercises the 100 TB path
        // (trainIvf's driver-sample variant stays for tiny inputs and the
        // recall spec). Whatever centroids THIS run trains are frozen into
        // the late-bound oracle, so parity is immune to ulp-level
        // aggregation-order variance across runs.
        val centroids = Sim.trainIvfDistributed(e, "vec_id", k = 16, iters = 4)
        IvfState.freeze(query, centroids, nProbe = 6)
        val assigned = Sim.ivfAssign(e.filter(col("vec_id") =!= 0), centroids)
        // materialize the 10-row answer, then release the working cache —
        // repeated invocations must not accumulate persisted partitions
        val out = Sim.ivfTopK(assigned, "vec_id", query, k = 10, centroids, nProbe = 6)
          .select(col("vec_id"), round(col("cos"), 3).as("cos"))
          .localCheckpoint()
        e.unpersist(blocking = false)
        out
      },
      None,
      covers = Seq("ext-knn-ivf"),
      oracleDyn = Some(() => IvfState.oracleSql)),

    // ------------------------------------------------------------------
    // PERSISTED IVF index (operators.IvfIndex): train ONCE on the first
    // half of the corpus, commit centroids + assignments as VersionedLake
    // tables (assignments partitioned by cell), then maintain the index
    // through an append commit that assigns ONLY the second half against
    // the persisted codebook — no re-train, no corpus rescan, the
    // incrementalLshPairs contract on the vector side. The probe reads
    // the published snapshot with cell-partition pruning. The oracle
    // replays assignment for ALL vectors from the frozen centroids —
    // which is exactly the invariant the index must keep: a vector's cell
    // is a pure function of the codebook, independent of WHEN (build or
    // delta) Spark assigned it. IvfIndexSpec pins the no-re-train and
    // O(delta) manifest properties; here the oracle pins the answer.
    QueryDef(
      "q_knn_ivf_persisted",
      (s, dir) => {
        // the index is a warm-up fixture (built on the odd half, even
        // half delta-appended — the two-commit maintenance shape); the
        // timed body is the PROBE, which is what a user of a persisted
        // index pays per query
        val (idxDir, cents) = persistedIvf(s, dir)
        val query = Sim.withNorm(t(s, dir, "embeddings"))
          .filter(col("vec_id") === 0)
          .select(col("v")).head().getSeq[Double](0).toSeq
        IvfPersistedState.freeze(query, cents, nProbe = 6)
        graft.operators.IvfIndex.topK(s, idxDir, query, k = 10, nProbe = 6)
          .select(col("id").as("vec_id"), round(col("cos"), 3).as("cos"))
      },
      None,
      covers = Seq("ext-knn-ivf-persisted"),
      oracleDyn = Some(() => IvfPersistedState.oracleSql)),

    // ------------------------------------------------------------------
    // Product-quantization encode (operators.Pq): 64-dim float vectors →
    // 8 int codes (nearest of 16 seeded centroids per 8-dim subspace).
    // Fully oracle-checked: the ‖w‖² − 2·v·w argmin op tree is generated
    // into DuckDB SQL from the SAME codebook literals. Pure projection —
    // encoding 100 TB is one scan, zero shuffles.
    QueryDef(
      "q_embed_pq",
      (s, dir) => {
        val b = graft.operators.Pq.seededBooks(64)
        graft.operators.Pq
          .encode(
            t(s, dir, "embeddings")
              .select(col("vec_id"), col("embedding").cast("array<double>").as("v")),
            b)
          .select(col("vec_id") +: (0 until b.m).map(j => col(s"code$j")): _*)
      },
      Some {
        val b = graft.operators.Pq.seededBooks(64)
        val codeCols = (0 until b.m).map(j => s"code$j").mkString(", ")
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           |${graft.operators.Pq.encodeOracleCte(b)}
           |SELECT vec_id, $codeCols FROM enc""".stripMargin
      },
      covers = Seq("ext-embed-pq")),

    // ------------------------------------------------------------------
    // PQ ADC top-10: approximate scores from per-subspace lookup tables
    // over the COMPRESSED codes (Σ_j lut_j[code_j] — m int probes per
    // vector instead of a dim-wide dot product), exact cosine re-rank of
    // the top-40 candidates. Also fully oracle-checked — both engines run
    // the identical two-stage plan from the same codebook literals.
    QueryDef(
      "q_knn_pq",
      (s, dir) => {
        val b = graft.operators.Pq.seededBooks(64)
        val e = Sim.withNorm(t(s, dir, "embeddings"))
        // one-row PARAMETER fetch (the ANN query point), not a data
        // collect: its v/norm values — Spark-computed, so bit-identical
        // to the old column form — parameterize the driver-built LUT
        val qRow = e.filter(col("vec_id") === 0).select(col("v"), col("norm")).head()
        val enc = graft.operators.Pq.encode(e.filter(col("vec_id") =!= 0), b)
        graft.operators.Pq.adcTopKLit(enc, "vec_id",
          qRow.getSeq[Double](0), qRow.getDouble(1), k = 10, b)
          .select(col("vec_id"), round(col("cos"), 3).as("cos"))
      },
      Some {
        val b = graft.operators.Pq.seededBooks(64)
        val luts = (0 until b.m)
          .map { j =>
            val ls = (0 until b.ksub)
              .map(c => graft.operators.Pq.subDistSql("qv", j, b.books(j)(c), b.dsub))
            s"[${ls.mkString(",\n      ")}] AS l$j"
          }
          .mkString(",\n    ")
        val adcSum = (0 until b.m).map(j => s"lut.l$j[c.code$j + 1]").mkString(" + ")
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           |${graft.operators.Pq.encodeOracleCte(b)},
           |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
           |lut AS (
           |  SELECT qv,
           |    $luts
           |  FROM q),
           |scored AS (
           |  SELECT c.vec_id, c.v, round($adcSum, 6) AS adc
           |  FROM enc c, lut WHERE c.vec_id != 0),
           |cand AS (SELECT vec_id, v FROM scored ORDER BY adc ASC, vec_id LIMIT 40),
           |rer AS (
           |  SELECT cand.vec_id,
           |    round(list_dot_product(cand.v, q.qv) /
           |      (sqrt(list_dot_product(cand.v, cand.v)) * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos
           |  FROM cand, q)
           |SELECT vec_id, round(cos, 3) AS cos FROM rer
           |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin
      },
      covers = Seq("ext-knn-pq")),

    // ------------------------------------------------------------------
    // Deterministic NEGATIVE SAMPLING for contrastive training export:
    // each query vector draws 5 reproducible negatives from outside its
    // label, priority = md5(q, cand) — a uniform sample that never
    // changes across runs/retries/engines (the q_train_test_split hash
    // discipline). Plan shape: the 20-row query side broadcasts over ONE
    // corpus scan, and per-query selection goes through the PartialTopK
    // physical operator — each map task ships at most 5 rows per query,
    // not the 20× fan-out (the thing that matters when the corpus is
    // 100 TB and the query set is 20k).
    QueryDef(
      "q_negative_sample",
      (s, dir) => {
        val e = t(s, dir, "embeddings").select(col("vec_id"), col("label"))
        val q = e.filter(col("vec_id") < 20)
          .select(col("vec_id").as("q_id"), col("label").as("q_label"))
        val joined = e
          .select(col("vec_id").as("cand_id"), col("label").as("cand_label"))
          .join(broadcast(q), col("cand_label") =!= col("q_label"))
          .withColumn(
            "pri",
            conv(
              substring(
                md5(concat_ws("_", col("q_id"), col("cand_id")).cast("binary")), 1, 15),
              16, 10).cast("long"))
        graft.operators.TopK
          .perKey(joined, Seq("q_id"), "pri", "cand_id", 5, descending = false)
          .select(
            col("q_id"), col("cand_id"), col("cand_label"),
            col("rn").as("neg_rank"))
      },
      Some("""SELECT q_id, cand_id, cand_label, CAST(rn AS INT) AS neg_rank
             |FROM (
             |  SELECT q.vec_id AS q_id, c.vec_id AS cand_id, c.label AS cand_label,
             |    row_number() OVER (PARTITION BY q.vec_id
             |      ORDER BY CAST(concat('0x', substr(md5(q.vec_id || '_' || c.vec_id), 1, 15)) AS BIGINT),
             |        c.vec_id) AS rn
             |  FROM embeddings q JOIN embeddings c ON c.label != q.label
             |  WHERE q.vec_id < 20)
             |WHERE rn <= 5""".stripMargin),
      covers = Seq("ext-negative-sample")),

    // ------------------------------------------------------------------
    // IVF-cell-blocked embedding near-dup (Similarity.ivfBlockedPairs):
    // the UNBLOCKED-corpus scale path next to q_dedup_embed_cosine's
    // label blocking — the blocking key derives from trained geometry,
    // every vector lands in its 2 best cells (multi-probe catches
    // boundary-straddling pairs), pairs form within shared cells only:
    // Σ occupancy² candidate work, partition-local per cell at scale.
    // Oracle: late-bound frozen centroids replay the identical 2-probe
    // assignment and pair join.
    QueryDef(
      "q_dedup_embed_ivf",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val centroids = Sim.trainIvfDistributed(e, "vec_id", k = 64, iters = 2, sampleCap = 8192)
        EmbedIvfDedupState.freeze(centroids)
        Sim.ivfBlockedPairs(e, "vec_id", centroids, threshold = 0.4)
          .localCheckpoint()
      },
      None,
      covers = Seq("ext-dedup-embed-ivf"),
      oracleDyn = Some(() => EmbedIvfDedupState.oracleSql)),

    // ------------------------------------------------------------------
    // SemDeDup (operators.Similarity.semDedup, arXiv:2303.09540) — the
    // LLM-corpus SEMANTIC dedup pass: k-means cells block the space,
    // keep-first inside a cell drops any doc with a lower-id cosine
    // neighbor over the threshold. Per-item rule, no transitive
    // chaining; Σ occupancy² work, partition-local per cell at scale.
    // Oracle: late-bound frozen centroids replay assignment + drop rule.
    QueryDef(
      "q_semdedup",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val centroids = Sim.trainIvfDistributed(e, "vec_id", k = 32, iters = 2, sampleCap = 8192)
        SemDedupState.freeze(centroids)
        Sim.semDedup(e, "vec_id", centroids, threshold = 0.4)
          .localCheckpoint()
      },
      None,
      covers = Seq("ext-semdedup"),
      oracleDyn = Some(() => SemDedupState.oracleSql)),

    // ------------------------------------------------------------------
    // IVF-PQ composition (operators.Pq.ivfPqTopK) — the canonical 100 TB
    // ANN layout: coarse IVF cells prune the corpus to nProbe partitions
    // (partition-pruned directories at scale), ADC scores the survivors'
    // COMPRESSED codes (m int probes per vector, not a dim-wide dot),
    // exact cosine re-rank of the top-40. Oracle: late-bound — the
    // trained centroids + probe list freeze into [[IvfPqState]], the
    // seeded PQ codebooks render at class init, and DuckDB replays the
    // identical four-stage plan.
    QueryDef(
      "q_knn_ivfpq",
      (s, dir) => {
        val b = graft.operators.Pq.seededBooks(64)
        val e = Sim.withNorm(t(s, dir, "embeddings")).cache()
        val query = e.filter(col("vec_id") === 0)
          .select(col("v")).head().getSeq[Double](0).toSeq
        val centroids = Sim.trainIvfDistributed(e, "vec_id", k = 16, iters = 4)
        IvfPqState.freeze(query, centroids, nProbe = 6)
        val out = graft.operators.Pq
          .ivfPqTopK(
            e.filter(col("vec_id") =!= 0), "vec_id", query,
            k = 10, centroids, b, nProbe = 6)
          .select(col("vec_id"), round(col("cos"), 3).as("cos"))
          .localCheckpoint()
        e.unpersist(blocking = false)
        out
      },
      None,
      covers = Seq("ext-knn-ivfpq"),
      oracleDyn = Some(() => IvfPqState.oracleSql)),

    // ------------------------------------------------------------------
    // PERSISTED IVF-PQ index (operators.IvfIndex.buildPq): the PQ
    // codebooks persist as a member table and every assignment row
    // carries its m int codes next to the vector — all three members
    // pinned by ONE LakeTxn record (multi-table atomic commit: a torn
    // build is invisible, IvfIndexSpec pins the crash window). The delta
    // append PQ-encodes against the persisted model, and the probe is
    // two-phase: ADC candidates from a codes-only scan (the spec pins
    // that its ReadSchema excludes v/norm — m ints per row at 100 TB,
    // never dim doubles), then an exact re-rank that fetches vectors for
    // just the k×refine candidate ids. Oracle: the same four-stage
    // replay as q_knn_ivfpq — cells and codes are pure functions of the
    // frozen model, so build-time vs append-time encoding is invisible.
    QueryDef(
      "q_knn_ivfpq_persisted",
      (s, dir) => {
        // index = warm-up fixture (buildPq on the odd half + delta
        // append); the timed body is the two-phase probe — ADC over the
        // codes-only scan, vector fetch for the k×refine candidates
        val (idxDir, cents) = persistedIvfPq(s, dir)
        val query = Sim.withNorm(t(s, dir, "embeddings"))
          .filter(col("vec_id") === 0)
          .select(col("v")).head().getSeq[Double](0).toSeq
        IvfPqPersistedState.freeze(query, cents, nProbe = 6)
        graft.operators.IvfIndex.topKPq(s, idxDir, query, k = 10, nProbe = 6)
          .select(col("id").as("vec_id"), round(col("cos"), 3).as("cos"))
      },
      None,
      covers = Seq("ext-knn-ivfpq-persisted"),
      oracleDyn = Some(() => IvfPqPersistedState.oracleSql)),

    // ------------------------------------------------------------------
    // MMR diversified retrieval (operators.Mmr): distributed cosine
    // shortlist (broadcast query, TakeOrdered(m)) then the greedy
    // λ·relevance − (1−λ)·max-redundancy re-rank over the m survivors.
    // Every similarity is rounded to 6 decimals before any comparison and
    // ties break on vec_id, so the DuckDB oracle replays the exact greedy
    // as one CTE per selection step.
    QueryDef(
      "q_mmr_rerank",
      (s, dir) =>
        graft.operators.Mmr.diversifiedTopK(s, t(s, dir, "embeddings")),
      Some(graft.operators.Mmr.oracleSql()),
      covers = Seq("ext-mmr")),

    // ------------------------------------------------------------------
    // Top principal direction + per-vector projection (operators.Pca).
    // The data pass is a Gram-matrix Aggregator (one partial-agg shuffle
    // of d² buffers, never vectors); power iteration on the 64×64 result
    // is driver-side and corpus-size-independent. The trained component is
    // rounded to 9 decimals, frozen into [[PcaState]], and the late-bound
    // oracle replays the projection over the identical literals — the
    // same freeze-the-model pattern as IVF/PQ/LSH. Both engines take the
    // dot product as a sequential left-to-right sum → bit-identical.
    QueryDef(
      "q_embed_pca",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val w = graft.operators.Pca.topComponent(e, "embedding", iters = 40)
        PcaState.freeze(w)
        e.select(
          col("vec_id"),
          col("label"),
          round(graft.operators.Pca.project(col("embedding"), w), 6).as("proj"))
      },
      None,
      covers = Seq("ext-embed-pca"),
      oracleDyn = Some(() => PcaState.oracleSql))
  )
}

/** Frozen top-principal-component for the late-bound q_embed_pca oracle. */
private[queries] object PcaState {
  @volatile private var component: Option[Array[Double]] = None

  def freeze(w: Array[Double]): Unit = component = Some(w)

  def oracleSql: Option[String] = component.map { w =>
    val lits = w.map(String.valueOf).mkString("[", ", ", "]")
    s"""SELECT vec_id, label,
       |  round(list_dot_product(embedding::DOUBLE[], $lits), 6) AS proj
       |FROM embeddings""".stripMargin
  }
}
