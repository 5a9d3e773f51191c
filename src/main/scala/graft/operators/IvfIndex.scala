package graft.operators

import graft.sources.VersionedLake
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTENT, incrementally-maintained IVF index — the vector-side
  * analogue of [[MinHash.incrementalLshPairs]]'s delta-vs-index contract.
  *
  * The per-query IVF path ([[Similarity.trainIvfDistributed]] +
  * [[Similarity.ivfAssign]]) re-trains the coarse quantizer and re-assigns
  * the whole corpus on every invocation — fine for one-off analysis,
  * wrong at 100 TB where the embedding corpus takes append commits all
  * day: training is a multi-pass k-means over the corpus sample and
  * assignment is a full scan. This index trains ONCE at build time and
  * persists both halves as [[VersionedLake]] tables:
  *
  *   - `indexDir/centroids` — one commit: (cell, centroid) rows. Never
  *     rewritten by appends; re-train is an explicit [[build]] (codebook
  *     drift is a deliberate, operator-driven event, as in FAISS/Milvus).
  *   - `indexDir/assignments` — (id, cell, v, norm) rows, PARTITIONED BY
  *     cell, so a probe reads nProbe cell directories, not the corpus.
  *     [[append]] assigns ONLY the delta against the persisted centroids
  *     and `appendCommit`s it: O(delta) work, O(delta) new files, and the
  *     commit is atomic + conflict-checked like any lake commit.
  *
  * Query ([[topK]]) reads the published assignment snapshot: partition
  * pruning on `cell` + exact cosine re-rank inside the probed cells.
  * Time travel comes free from the lake — `topKAt` answers "what would
  * this query have returned before yesterday's append" for reproducible
  * evals.
  */
object IvfIndex {

  def centroidsDir(indexDir: String): String = s"$indexDir/centroids"
  def assignmentsDir(indexDir: String): String = s"$indexDir/assignments"

  /** Train the coarse quantizer on `df` (bounded-sample distributed
    * k-means) and commit centroids + the full initial assignment. The one
    * corpus-scan event in the index lifecycle.
    */
  def build(
      df: DataFrame,
      idCol: String,
      indexDir: String,
      k: Int = 16,
      iters: Int = 4): Seq[Seq[Double]] = {
    val spark = df.sparkSession
    val cents = Similarity.trainIvfDistributed(df, idCol, k, iters)
    import spark.implicits._
    VersionedLake.commit(
      cents.zipWithIndex.map { case (c, i) => (i, c) }.toDF("cell", "centroid"),
      centroidsDir(indexDir))
    VersionedLake.commit(assignRows(df, idCol, cents), assignmentsDir(indexDir),
      parts = Seq("cell"))
    cents
  }

  /** The persisted codebook, cell-ordered. One tiny-table read. */
  def centroids(spark: SparkSession, indexDir: String): Seq[Seq[Double]] =
    VersionedLake.read(spark, centroidsDir(indexDir))
      .orderBy("cell")
      .collect()
      .map(_.getSeq[Double](1).toSeq)
      .toSeq

  private def assignRows(df: DataFrame, idCol: String, cents: Seq[Seq[Double]]): DataFrame =
    Similarity.ivfAssign(df, cents)
      .select(col(idCol).as("id"), col("cell"), col("v"), col("norm"))

  /** Maintain the index for an embedding-corpus append commit: assign
    * ONLY `delta` using the PERSISTED centroids (no re-train, no corpus
    * rescan) and append-commit the new assignments. Returns the new
    * assignment-table version.
    */
  def append(delta: DataFrame, idCol: String, indexDir: String): Long = {
    val cents = centroids(delta.sparkSession, indexDir)
    VersionedLake.appendCommit(assignRows(delta, idCol, cents),
      assignmentsDir(indexDir), parts = Seq("cell"))
  }

  /** ANN top-k against the index's published snapshot: probe the nProbe
    * best cells (partition-pruned read), exact cosine re-rank inside.
    */
  def topK(
      spark: SparkSession,
      indexDir: String,
      query: Seq[Double],
      k: Int,
      nProbe: Int = 4): DataFrame =
    rank(VersionedLake.read(spark, assignmentsDir(indexDir)), spark, indexDir, query, k, nProbe)

  /** [[topK]] against a RETAINED assignment version — reproducible evals
    * against the corpus as-of an earlier append.
    */
  def topKAt(
      spark: SparkSession,
      indexDir: String,
      version: Long,
      query: Seq[Double],
      k: Int,
      nProbe: Int = 4): DataFrame =
    rank(VersionedLake.readVersion(spark, assignmentsDir(indexDir), version),
      spark, indexDir, query, k, nProbe)

  private def rank(
      assigned: DataFrame,
      spark: SparkSession,
      indexDir: String,
      query: Seq[Double],
      k: Int,
      nProbe: Int): DataFrame = {
    val cents = centroids(spark, indexDir)
    val probe = Similarity.probeCells(query, cents, nProbe)
    val qn = math.sqrt(query.map(x => x * x).sum)
    val qCol = array(query.map(lit): _*)
    assigned
      .filter(col("cell").isin(probe.map(_.asInstanceOf[Any]): _*))
      .select(
        col("id"),
        (Similarity.dot(col("v"), qCol) / (col("norm") * lit(qn))).as("cos"))
      .orderBy(round(col("cos"), 6).desc, col("id"))
      .limit(k)
  }
}
