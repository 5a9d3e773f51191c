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

  /** Maintain the index from a VersionedLake-committed embedding corpus
    * by MANIFEST DIFF: the corpus's commit log says exactly which data
    * directories are new since the last sync, so the delta is read
    * dir-exactly (no timestamps, no full-scan anti-join — the log IS the
    * change feed). The last-synced corpus version rides the assignment
    * table's own manifest as a txn watermark (`appId = "corpus-sync"`,
    * `batchId = corpus version`), which buys exactly-once for free: the
    * watermark moves atomically WITH the assignment commit, a crashed
    * sync replays idempotently, and two racing syncs serialize through
    * the lake's optimistic concurrency. Returns the corpus version now
    * reflected, or None when the corpus is empty. Append-only corpora:
    * upserts/deletes rewrite directories and need a [[build]] (an
    * explicit re-index, like codebook drift).
    */
  def sync(
      spark: SparkSession,
      corpusDir: String,
      idCol: String,
      indexDir: String,
      k: Int = 16,
      iters: Int = 4): Option[Long] = {
    val corpusV = VersionedLake.currentVersion(spark, corpusDir).getOrElse(return None)
    val asgDir = assignmentsDir(indexDir)
    VersionedLake.currentVersion(spark, asgDir) match {
      case None =>
        // first sync IS the build: train + assign the snapshot, with the
        // corpus watermark riding the same commit (crash-replay safe)
        val snapshot = VersionedLake.readVersion(spark, corpusDir, corpusV)
        val cents = Similarity.trainIvfDistributed(snapshot, idCol, k, iters)
        import spark.implicits._
        VersionedLake.commit(
          cents.zipWithIndex.map { case (c, i) => (i, c) }.toDF("cell", "centroid"),
          centroidsDir(indexDir))
        VersionedLake.appendCommitTxn(assignRows(snapshot, idCol, cents), asgDir,
          appId = SyncApp, batchId = corpusV, parts = Seq("cell"))
        Some(corpusV)
      case Some(asgV) =>
        val lastSynced = VersionedLake.txnWatermarks(spark, asgDir, asgV)
          .getOrElse(SyncApp,
            throw new IllegalStateException(
              s"$indexDir was built from a DataFrame, not synced from a lake " +
                "corpus - keep maintaining it through append()"))
        if (corpusV <= lastSynced) return Some(lastSynced) // already reflected
        val curDirs = VersionedLake.manifest(spark, corpusDir, corpusV)
        val priorDirs = VersionedLake.manifest(spark, corpusDir, lastSynced).toSet
        require(priorDirs.forall(curDirs.contains),
          s"$corpusDir rewrote directories since version $lastSynced " +
            "(upsert/delete/compaction) - the index needs an explicit build()")
        val newDirs = curDirs.filterNot(priorDirs)
        if (newDirs.isEmpty) return Some(corpusV)
        val schema = VersionedLake.versionSchema(spark, corpusDir, corpusV)
        val reader = spark.read.option("basePath", s"$corpusDir/data")
        val paths = newDirs.map(d => s"$corpusDir/data/$d")
        val delta =
          schema.fold(reader.parquet(paths: _*))(s => reader.schema(s).parquet(paths: _*))
        val cents = centroids(spark, indexDir)
        VersionedLake.appendCommitTxn(assignRows(delta, idCol, cents), asgDir,
          appId = SyncApp, batchId = corpusV, parts = Seq("cell"))
        Some(corpusV)
    }
  }

  private val SyncApp = "corpus-sync"

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
