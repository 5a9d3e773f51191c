package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash signatures + LSH banding for near-duplicate detection at scale.
  *
  * Hash family: h_i(x) = (a_i * (x mod P) + b_i) mod P over a 60-bit
  * content hash x (first 15 hex digits of md5). P is a prime > 2^32; a_i
  * stays < 2^16 so every intermediate fits in a signed 64-bit integer with
  * no overflow in either Spark or DuckDB (DuckDB errors on i64 overflow).
  *
  * The constants and the shingle definition are shared between the Spark
  * column builders and the generated DuckDB oracle so both engines compute
  * bit-identical signatures.
  *
  * Scale design: signatures are one explode + one groupBy (shuffle keyed on
  * doc_id, partial min() map-side). Candidate pairs via [[lshCandidatePairs]]
  * shuffle on (band, bandKey) — linear in corpus + output pairs, never the
  * quadratic all-pairs join.
  */
object MinHash {

  val K = 16
  val P = 4294967311L // prime > 2^32
  def a(i: Int): Long = 97L + 31L * i // < 2^16 ⇒ a*(x mod P) < 2^49
  def b(i: Int): Long = 911L + 257L * i

  /** 60-bit deterministic content hash of a shingle string. */
  def shingleHash(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  def minhashCol(h: Column, i: Int): Column =
    min((h % P * a(i) + b(i)) % P).as(s"m$i")

  def minhashCols(h: Column, is: Seq[Int]): Seq[Column] =
    is.map(minhashCol(h, _))

  /** lowercase whitespace words, empties dropped. */
  def words(c: Column): Column =
    filter(split(lower(c), "\\s+"), x => x =!= "")

  /** distinct word n-gram shingles (array input must have size >= n). */
  def shingles(ws: Column, n: Int): Column =
    array_distinct(
      transform(
        sequence(lit(1), size(ws) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(o => element_at(ws, i + o)): _*)))

  /** docs(idCol, textCol) → (idCol, s) exploded distinct 2-gram shingles.
    * Uses the native [[graft.functions.WordShingles]] kernel — identical
    * output to `explode(shingles(words(text), 2))` but one codegen'd call
    * per row instead of four interpreted higher-order functions.
    */
  def shingleRows(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), explode(graft.functions.TextExprs.wordShingles(col(textCol), 2)).as("s"))

  /** docs(idCol, textCol) → (idCol, m0..m{K-1}) MinHash signature. */
  def signatures(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hashed = shingleRows(docs, idCol, textCol)
      .withColumn("h", shingleHash(col("s")))
    hashed.groupBy(idCol).agg(minhashCol(col("h"), 0), minhashCols(col("h"), 1 until K): _*)
  }

  /** LSH banding: docs sharing any band of `rowsPerBand` consecutive
    * signature components become a candidate pair. bands = K / rowsPerBand.
    * Output: (id_a, id_b) distinct, id_a < id_b.
    */
  /** (idCol, band, key) rows — one per (doc, band). This is the inverted
    * index a persisted LSH table stores (bucketed by (band, key) at
    * scale) and both the batch and incremental pair generators join on.
    */
  def bandRows(sig: DataFrame, idCol: String, rowsPerBand: Int = 4): DataFrame = {
    require(K % rowsPerBand == 0, s"K=$K must divide by rowsPerBand=$rowsPerBand")
    val bands = K / rowsPerBand
    val bandKeys = (0 until bands).map { bnd =>
      struct(
        lit(bnd).as("band"),
        xxhash64((0 until rowsPerBand).map(r => col(s"m${bnd * rowsPerBand + r}")): _*)
          .as("key"))
    }
    sig
      .select(col(idCol), explode(array(bandKeys: _*)).as("bk"))
      .select(col(idCol), col("bk.band").as("band"), col("bk.key").as("key"))
  }

  def lshCandidatePairs(sig: DataFrame, idCol: String, rowsPerBand: Int = 4): DataFrame = {
    val exploded = bandRows(sig, idCol, rowsPerBand)
    exploded.as("a")
      .join(
        exploded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
  }

  /** INCREMENTAL candidate pairs for an ingest batch: only pairs that
    * involve at least one NEW document — new×existing and new×new band
    * matches; existing×existing pairs were produced when those docs
    * arrived. The delta side is the only side band-exploded from fresh
    * signatures; `index` is the full (id, band, key) inverted index (at
    * scale: the persisted table, bucketed by (band, key), appended per
    * batch), so per-batch cost is O(delta bands + matches), never
    * O(corpus²) — the property that makes continuous dedup affordable
    * on a corpus that grows by TBs per day.
    */
  def incrementalLshPairs(
      index: DataFrame,
      newSig: DataFrame,
      idCol: String,
      rowsPerBand: Int = 4): DataFrame = {
    val delta = bandRows(newSig, idCol, rowsPerBand)
    delta.as("a")
      .join(
        index.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col(s"a.$idCol") =!= col(s"b.$idCol"))
      .select(
        least(col(s"a.$idCol"), col(s"b.$idCol")).as("id_a"),
        greatest(col(s"a.$idCol"), col(s"b.$idCol")).as("id_b"))
      .distinct()
  }

  /** Candidate pairs re-ranked with exact shingle Jaccard; keeps j >= thr. */
  def nearDuplicates(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      rowsPerBand: Int = 4): DataFrame = {
    val sh = shingleRows(docs, idCol, textCol).cache()
    val sig = signatures(docs, idCol, textCol)
    val cands = lshCandidatePairs(sig, idCol, rowsPerBand)
    val sizes = sh.groupBy(idCol).agg(count(lit(1)).as("n"))
    val pairInter = cands
      .join(sh.toDF("id_a", "s"), "id_a")
      .join(sh.toDF("id_b", "s"), Seq("id_b", "s")) // same shingle on both sides
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("inter"))
    // NO broadcast hint on the size lookups: `sizes` is one row per
    // DOCUMENT — broadcasting it caps the operator at
    // driver-memory-sized corpora. AQE broadcasts when it really is
    // small; at scale these are keyed shuffle joins of the (much
    // smaller) candidate-pair frame.
    val out = pairInter
      .join(sizes.toDF("id_a", "na"), "id_a")
      .join(sizes.toDF("id_b", "nb"), "id_b")
      .select(
        col("id_a"),
        col("id_b"),
        (col("inter") * lit(1.0) / (col("na") + col("nb") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      // materialize before releasing the shingle cache — the caller gets
      // computed work, and repeated invocations don't stack cached
      // partitions for the session lifetime
      .localCheckpoint()
    sh.unpersist(blocking = false)
    out
  }

  /** CROSS-CORPUS near-dup JOIN: incoming documents that near-duplicate
    * any document of a standing base corpus — the everyday production
    * shape (dedupe a fresh crawl against the curated corpus before
    * admission) that neither the self-join ([[nearDuplicates]]: one
    * corpus against itself) nor the delta-vs-index form
    * ([[incrementalLshPairs]]: candidates only, no verify) covers.
    *
    * Both sides are band-exploded and joined on (band, key) — the pair
    * space is linear in corpus sizes + band collisions, never
    * |base|×|incoming| — then candidates are verified with exact shingle
    * Jaccard and kept at `jaccard >= threshold`. Output:
    * (inc_id, base_id, jaccard), one row per surviving cross pair.
    *
    * 100 TB shape: the base side's band rows are exactly the persisted
    * LSH inverted index (bucketed by (band, key)); only the incoming
    * batch is freshly signed, so steady-state cost is
    * O(incoming + collisions + verify) per batch regardless of how large
    * the curated corpus has grown.
    */
  def crossCorpusDuplicates(
      base: DataFrame,
      incoming: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      rowsPerBand: Int = 4): DataFrame = {
    val shBase = shingleRows(base, idCol, textCol).cache()
    val shInc = shingleRows(incoming, idCol, textCol).cache()
    val cands = bandRows(signatures(incoming, idCol, textCol), idCol, rowsPerBand).as("a")
      .join(
        bandRows(signatures(base, idCol, textCol), idCol, rowsPerBand).as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key"))
      .select(col(s"a.$idCol").as("inc_id"), col(s"b.$idCol").as("base_id"))
      .distinct()
    val pairInter = cands
      .join(shInc.toDF("inc_id", "s"), "inc_id")
      .join(shBase.toDF("base_id", "s"), Seq("base_id", "s"))
      .groupBy("inc_id", "base_id")
      .agg(count(lit(1)).as("inter"))
    // size lookups stay shuffle joins, not broadcasts — one row per
    // document on each side (see nearDuplicates' note).
    val out = pairInter
      .join(shInc.groupBy(idCol).agg(count(lit(1)).as("na")).toDF("inc_id", "na"), "inc_id")
      .join(shBase.groupBy(idCol).agg(count(lit(1)).as("nb")).toDF("base_id", "nb"), "base_id")
      .select(
        col("inc_id"),
        col("base_id"),
        (col("inter") * lit(1.0) / (col("na") + col("nb") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .localCheckpoint()
    shBase.unpersist(blocking = false)
    shInc.unpersist(blocking = false)
    out
  }

  /** DuckDB SQL computing identical signatures (oracle for q_dedup_minhash). */
  val signatureOracle: String = {
    val mins = (0 until K)
      .map(i => s"min((h % $P * ${a(i)} + ${b(i)}) % $P) AS m$i")
      .mkString(",\n    ")
    s"""WITH sh AS (
       |  SELECT doc_id, unnest(list_distinct(
       |      [ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))])) AS s
       |  FROM (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
       |          x -> x != '') AS ws
       |        FROM documents)
       |  WHERE len(ws) >= 2),
       |hashed AS (
       |  SELECT doc_id, CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) AS h
       |  FROM sh)
       |SELECT doc_id,
       |    $mins
       |FROM hashed GROUP BY doc_id""".stripMargin
  }
}
