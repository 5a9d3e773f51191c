package graft.operators

import graft.functions.VectorExprs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact Jaccard set-similarity self-join — the engine's near-duplicate
  * detector. Two physical strategies behind one logical operator, chosen
  * by a measured property of the data (vocabulary size), not guessed:
  *
  * '''Sparse path (prefix filtering, PPJoin).''' The naive plan self-joins
  * the (id, token) table on token: every token in k docs contributes k²
  * join rows — one common bigram in 100k docs alone is 10^10 rows. Prefix
  * filtering keeps it exact while generating candidates only from each
  * set's globally-rarest tokens:
  *
  *   1. order tokens by (document frequency asc, hash);
  *   2. explode only each set's PREFIX — its first |x| − ⌈t·|x|⌉ + 1
  *      ordered tokens. Lemma (AllPairs/PPJoin): J(A,B) ≥ t ⇒
  *      |A∩B| ≥ ⌈t·|A|⌉, so the globally-smallest common element lies in
  *      both prefixes; pairs sharing only frequent suffix tokens are never
  *      generated;
  *   3. length filter (t·|B| ≤ |A| ≤ |B|/t) inside the candidate join;
  *   4. verify candidates exactly with array_intersect.
  *
  * This is the 100 TB default: every stage is a keyed shuffle linear in
  * corpus + candidates, and heavy-hitter tokens drop out of all prefixes.
  *
  * '''Dense path (dictionary bitmaps).''' When the DISTINCT-token count is
  * small (measured with one cheap agg), prefix filtering cannot prune —
  * every token is frequent, nearly every pair shares prefix tokens, and
  * candidate generation degenerates to all-pairs through a shuffle. The
  * engine instead dictionary-encodes each set as a V-bit bitmap
  * (V = vocabulary size, e.g. 931 tokens → 15 longs), broadcasts the
  * encoded table, and evaluates ALL length-compatible pairs in one
  * BroadcastNestedLoopJoin stage with a codegen'd AND+popcount
  * ([[graft.functions.BitmapAndCount]]) — no shuffle, no candidate
  * materialization, ~1ns per 64 vocabulary bits per pair. The broadcast
  * is V/8 bytes per row; the guard on row count keeps it sane.
  */
object SetSimJoin {

  /** tokens: (idCol, hCol) rows, DISTINCT (id, token-hash) pairs.
    * Returns (id_a, id_b, inter, na, nb) for exactly the pairs with
    * inter·1.0/(na+nb−inter) ≥ t (the same IEEE predicate an external
    * verifier would apply to the integers; recompute J downstream from the
    * integers for bit-stable output).
    */
  def jaccardSelfJoin(
      tokens: DataFrame,
      idCol: String,
      hCol: String,
      t: Double,
      denseVocabMax: Long = 1L << 16,
      denseRowsMax: Long = 1L << 17): DataFrame = {
    val tok = tokens.select(col(idCol).as("id"), col(hCol).as("h")).cache()
    // one probe job decides the strategy AND (when dense) yields the
    // dictionary: collect distinct tokens, bailing out past the cap.
    val probe = tok.select("h").distinct()
      .limit((denseVocabMax + 1).toInt).collect().map(_.getLong(0))
    val (result, working) =
      if (probe.length <= denseVocabMax) {
        // encode + CACHE the per-set bitmaps; the guard count materializes
        // them, so the NLJ's two sides (probe + broadcast build) both read
        // the cache instead of recomputing the tokenize pipeline. dense is
        // quadratic in doc count and broadcasts docCount * V/8 bitmap
        // bytes — both must stay bounded.
        val sets = encodeBitmaps(tok, probe.sorted).cache()
        val docCount = sets.count()
        val nWords = (probe.length + 63) >> 6
        if (docCount <= denseRowsMax && docCount * (nWords * 8L + 24L) <= (256L << 20))
          (denseSelfJoin(sets, t), Seq(sets, tok))
        else (prefixSelfJoin(tok, t), Seq(sets, tok))
      } else (prefixSelfJoin(tok, t), Seq(tok))
    // materialize the (pairs-above-threshold, i.e. orders-of-magnitude
    // smaller than the input) result eagerly, then release the working
    // caches — repeated invocations must not accumulate persisted
    // partitions for the session's lifetime.
    val out = result.localCheckpoint()
    working.foreach(_.unpersist(blocking = false))
    out
  }

  /** Sparse/prefix strategy; exact for any vocabulary. */
  def prefixSelfJoin(tok: DataFrame, t: Double): DataFrame = {
    val dfc = tok.groupBy("h").agg(count(lit(1)).as("dfc"))

    // per-set token array in global (dfc asc, h) order + set size
    val ordered = tok
      .join(dfc, "h")
      .groupBy("id")
      .agg(array_sort(collect_list(struct(col("dfc"), col("h")))).as("a"))
      .select(
        col("id"),
        transform(col("a"), x => x("h")).as("arr"),
        size(col("a")).as("n"))

    // ⌈t·n⌉ computed on a 9-decimal rounding of the FP product: when t·n is
    // exactly integral, the raw double can land epsilon above it and ceil
    // would overshoot, under-sizing the prefix and silently losing recall.
    val plen = (col("n") - ceil(round(col("n") * lit(t), 9)) + 1).cast("int")
    val pre = ordered.select(
      col("id"), col("n"), explode(slice(col("arr"), lit(1), plen)).as("h"))

    val cand = pre.as("a")
      .join(
        pre.as("b"),
        col("a.h") === col("b.h") && col("a.id") < col("b.id") &&
          col("a.n") >= col("b.n") * lit(t) && col("b.n") >= col("a.n") * lit(t))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()

    cand
      .join(
        ordered.select(col("id").as("id_a"), col("arr").as("arr_a"), col("n").as("na")),
        "id_a")
      .join(
        ordered.select(col("id").as("id_b"), col("arr").as("arr_b"), col("n").as("nb")),
        "id_b")
      .select(
        col("id_a"),
        col("id_b"),
        size(array_intersect(col("arr_a"), col("arr_b"))).as("inter"),
        col("na"),
        col("nb"))
      .filter(col("inter") * lit(1.0) / (col("na") + col("nb") - col("inter")) >= lit(t))
  }

  /** Exact asymmetric-CONTAINMENT self-join: all pairs with
    * |A∩B| / min(|A|,|B|) ≥ t — the doc-inside-doc relation Jaccard-tuned
    * LSH banding structurally misses at extreme size ratios (a 12-shingle
    * snippet inside a 400-shingle page has containment 1.0 but J ≈ 0.03;
    * per-band agreement ≈ J^rows makes the banding miss probability
    * ~1 − 4·J⁴ ≈ certain).
    *
    * Recall here is GUARANTEED, not probabilistic, by a containment
    * pigeonhole: C(A,B) ≥ t with |A| = min ⇒ |A∩B| ≥ ⌈t·|A|⌉ ⇒ B
    * intersects A's (|A| − ⌈t·|A|⌉ + 1) globally-RAREST tokens. So
    * candidates are (smaller-side prefix) ⨝ (FULL postings) on the
    * token — both orientations fall out of one join because the postings
    * side is every doc's tokens. No length filter exists (containment has
    * no size-ratio constraint — that is the point), so the postings side
    * cannot prune by size: cost is Σ_{s ∈ prefixes} df(s), dominated by
    * rare tokens by construction but degenerate on corpora with no rare
    * tokens — at that extreme, fall back to the probabilistic
    * size-stratified banding or raise t (prefixes shrink as 1−t).
    * Verification touches candidates only (exact array_intersect).
    * Returns (id_a, id_b, inter, na, nb) with id_a < id_b.
    */
  def containmentSelfJoin(
      tokens: DataFrame,
      idCol: String,
      hCol: String,
      t: Double,
      denseVocabMax: Long = 1L << 16,
      denseRowsMax: Long = 1L << 17): DataFrame = {
    require(t > 0.0 && t <= 1.0, s"containment threshold in (0,1], got $t")
    val tok = tokens.select(col(idCol).as("id"), col(hCol).as("h")).cache()
    // same measured dispatch as [[jaccardSelfJoin]], and for containment
    // the dense case matters MORE: with no size-ratio constraint a dense
    // vocabulary makes "rare" tokens df-heavy, so the prefix filter
    // degenerates (measured: 6.9M candidate rows → 259 survivors at
    // sf0.1's 931-token vocabulary, ~8 s) while the bitmap NLJ evaluates
    // all ordered pairs shuffle-free with a codegen'd popcount (~2 s).
    val probe = tok.select("h").distinct()
      .limit((denseVocabMax + 1).toInt).collect().map(_.getLong(0))
    val (result, working) =
      if (probe.length <= denseVocabMax) {
        val sets = encodeBitmaps(tok, probe.sorted).cache()
        val docCount = sets.count()
        val nWords = (probe.length + 63) >> 6
        if (docCount <= denseRowsMax && docCount * (nWords * 8L + 24L) <= (256L << 20))
          (containmentDenseJoin(sets, t), Seq(sets, tok))
        else (containmentPrefixJoin(tok, t), Seq(sets, tok))
      } else (containmentPrefixJoin(tok, t), Seq(tok))
    val out = result.localCheckpoint()
    working.foreach(_.unpersist(blocking = false))
    out
  }

  /** Dense/bitmap containment over pre-encoded (id, bm, n) sets: every
    * ordered pair (NO length filter — containment has no size-ratio
    * constraint, which is the point), threshold evaluated inside the join
    * condition so non-qualifying pairs never materialize a joined row.
    */
  def containmentDenseJoin(sets: DataFrame, t: Double): DataFrame = {
    val a = sets.select(col("id").as("id_a"), col("bm").as("bm_a"), col("n").as("na"))
    val b = sets.select(col("id").as("id_b"), col("bm").as("bm_b"), col("n").as("nb"))
    def inter = VectorExprs.bitmapAndCount(col("bm_a"), col("bm_b"))
    a.join(
        broadcast(b),
        col("id_a") < col("id_b") &&
          inter * lit(1.0) / least(col("na"), col("nb")) >= lit(t))
      .select(col("id_a"), col("id_b"), inter.as("inter"), col("na"), col("nb"))
  }

  /** Sparse/prefix containment strategy; exact for any vocabulary. The
    * pigeonhole: C(A,B) ≥ t with |A| = min ⇒ B intersects A's
    * (|A| − ⌈t·|A|⌉ + 1) globally-rarest tokens, so candidates are
    * smaller-side prefixes joined against full postings (`a.n <= b.n`
    * inside the condition drops the redundant orientation). Cost is
    * Σ_{s ∈ prefixes} df(s) — fine for sparse vocabularies, degenerate
    * for dense ones, which is why the dispatcher prefers the bitmap NLJ
    * whenever the dictionary fits.
    */
  def containmentPrefixJoin(tok: DataFrame, t: Double): DataFrame = {
    val dfc = tok.groupBy("h").agg(count(lit(1)).as("dfc"))
    val ordered = tok
      .join(dfc, "h")
      .groupBy("id")
      .agg(array_sort(collect_list(struct(col("dfc"), col("h")))).as("a"))
      .select(
        col("id"),
        transform(col("a"), x => x("h")).as("arr"),
        size(col("a")).as("n"))
    // same robust ⌈t·n⌉ as the Jaccard prefix (9-decimal rounding first)
    val plen = (col("n") - ceil(round(col("n") * lit(t), 9)) + 1).cast("int")
    val pre = ordered.select(
      col("id"), col("n"), explode(slice(col("arr"), lit(1), plen)).as("h"))
    val postings = tok.join(tok.groupBy("id").agg(count(lit(1)).as("n")), "id")
    val cand = pre.as("a")
      .join(
        postings.as("b"),
        col("a.h") === col("b.h") && col("a.id") =!= col("b.id") &&
          col("a.n") <= col("b.n"))
      .select(
        least(col("a.id"), col("b.id")).as("id_a"),
        greatest(col("a.id"), col("b.id")).as("id_b"))
      .distinct()
    cand
      .join(
        ordered.select(col("id").as("id_a"), col("arr").as("arr_a"), col("n").as("na")),
        "id_a")
      .join(
        ordered.select(col("id").as("id_b"), col("arr").as("arr_b"), col("n").as("nb")),
        "id_b")
      .select(
        col("id_a"),
        col("id_b"),
        size(array_intersect(col("arr_a"), col("arr_b"))).as("inter"),
        col("na"),
        col("nb"))
      .filter(col("inter") * lit(1.0) / least(col("na"), col("nb")) >= lit(t))
  }

  /** (id, h) tokens → (id, bm: array<long> bitmap, n) via a sorted-vocab
    * dictionary broadcast to executors.
    */
  def encodeBitmaps(tok: DataFrame, vocab: Array[Long]): DataFrame = {
    val nWords = (vocab.length + 63) >> 6
    val idx: Map[Long, Int] = vocab.zipWithIndex.toMap
    val bIdx = tok.sparkSession.sparkContext.broadcast(idx)
    val toBitmap = udf((hs: Seq[Long]) => {
      val bm = new Array[Long](nWords)
      hs.foreach { h =>
        val i = bIdx.value(h)
        bm(i >> 6) |= 1L << (i & 63)
      }
      bm
    })
    tok
      .groupBy("id")
      .agg(collect_list(col("h")).as("hs"))
      .select(col("id"), toBitmap(col("hs")).as("bm"), size(col("hs")).as("n"))
  }

  /** Dense/bitmap strategy over pre-encoded (id, bm, n) sets; requires a
    * broadcastable encoded table. One BroadcastNestedLoopJoin, zero
    * shuffles.
    */
  def denseSelfJoin(sets: DataFrame, t: Double): DataFrame = {
    val a = sets.select(col("id").as("id_a"), col("bm").as("bm_a"), col("n").as("na"))
    val b = sets.select(col("id").as("id_b"), col("bm").as("bm_b"), col("n").as("nb"))
    // The threshold predicate lives INSIDE the join condition: evaluated
    // there, non-qualifying pairs die before the join materializes a
    // joined row (copying both bitmap arrays per pair — the dominant cost
    // when ~all n²/2 ordered pairs reach the output projection otherwise).
    // The popcount runs twice per surviving pair (once in the condition,
    // once in the projection) — survivors are orders of magnitude rarer
    // than candidates, and a popcount is ~1ns per 64 vocabulary bits vs
    // hundreds per row copy. The division form of the predicate is kept
    // verbatim so the IEEE comparison matches the naive verifier bit for
    // bit.
    def inter = VectorExprs.bitmapAndCount(col("bm_a"), col("bm_b"))
    a.join(
        broadcast(b),
        col("id_a") < col("id_b") &&
          col("na") >= col("nb") * lit(t) && col("nb") >= col("na") * lit(t) &&
          inter * lit(1.0) / (col("na") + col("nb") - inter) >= lit(t))
      .select(col("id_a"), col("id_b"), inter.as("inter"), col("na"), col("nb"))
  }
}
