package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair encoding) MERGE-RULE TRAINING — the
  * tokenizer-construction side of the pipeline (`q_bpe_tokens` covers
  * only pre-tokenization). Reference shape: Sennrich et al.'s
  * dictionary-based trainer, with the dictionary kept DISTRIBUTED.
  *
  * Cost model at 100 TB: the corpus is read ONCE (pre-token histogram,
  * one shuffle of (token, count) pairs — never documents). Every merge
  * iteration then runs on the histogram, whose size is the corpus
  * VOCABULARY (corpus-size-independent): pair counts are one
  * explode+sum over adjacent symbol pairs weighted by word count, the
  * argmax is a single driver row, and the merge application is a typed
  * map over histogram rows. Iteration state persists serialized with
  * the predecessor released each step (the pageRank loop discipline).
  */
object Bpe {

  /** GPT-2-shaped ASCII pre-tokenizer (runs of letters / digits /
    * punctuation, optionally carrying their leading space) — shared
    * verbatim by training, segmentation, and the DuckDB oracle.
    */
  val PreTokenRegex = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"

  private val IterStorage =
    org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER

  /** One GREEDY, LEFT-TO-RIGHT, NON-OVERLAPPING merge pass: every
    * adjacent (l, r) becomes l+r, scanning resumes AFTER the merged
    * symbol ("a a a" under (a,a) → "aa a"). This is both how the
    * training state evolves and what a non-overlapping string replace
    * computes — the equivalence the oracle rests on.
    */
  private[operators] def mergeOnce(
      syms: IndexedSeq[String], l: String, r: String): IndexedSeq[String] = {
    val out = IndexedSeq.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else {
        out += syms(i); i += 1
      }
    }
    out.result()
  }

  /** Learn `numMerges` rules over `textCol`. Deterministic tie-break:
    * (pair count desc, left asc, right asc). Stops early when no pair
    * remains.
    *
    * The corpus-sized pass (pre-token histogram) is declarative —
    * Catalyst/codegen where the bytes are. The ITERATION loop runs on
    * RDDs deliberately: each round is two vocabulary-sized jobs whose
    * wall time would otherwise be dominated by per-iteration plan
    * compilation (a fresh whole-stage codegen per round costs more than
    * the data), the canonical "imperative loop over small state" case
    * the RDD layer exists for — the same reasoning as the graph loops.
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int): Seq[(String, String)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val hist = docs
      .select(explode(expr(
        s"regexp_extract_all($textCol, '$PreTokenRegex', 0)")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .as[(String, Long)]
    // vocabulary-sized state: bound partitions well below the corpus
    // shuffle's (8 partitions hold a web-scale ~10M-word dictionary at
    // ~1M rows each; a test corpus runs one task per job, not 32)
    val parts = math.max(1, math.min(8, spark.sparkContext.defaultParallelism))
    var state: org.apache.spark.rdd.RDD[(IndexedSeq[String], Long)] = hist.rdd
      .map { case (w, n) => (w.map(_.toString).toIndexedSeq, n) }
      .coalesce(parts)
      .persist(IterStorage)
    state.count(): Unit
    val pairOrd = Ordering.Tuple3[Long, String, String]
    val merges = Seq.newBuilder[(String, String)]
    var done = false
    var i = 0
    while (i < numMerges && !done) {
      val top = state
        .flatMap { case (syms, n) =>
          var j = 0
          val b = Seq.newBuilder[((String, String), Long)]
          while (j + 1 < syms.length) { b += ((syms(j), syms(j + 1)) -> n); j += 1 }
          b.result()
        }
        .reduceByKey(_ + _, parts)
        .map { case ((l, r), c) => (-c, l, r) }
        .takeOrdered(1)(pairOrd)
      if (top.isEmpty) done = true
      else {
        val (_, l, r) = top(0)
        merges += ((l, r))
        val prev = state
        state = prev.map { case (syms, n) => (mergeOnce(syms, l, r), n) }
          .persist(IterStorage)
        state.count(): Unit
        prev.unpersist(blocking = false)
      }
      i += 1
    }
    state.unpersist(blocking = false)
    merges.result()
  }

  /** Segment the corpus by replaying `merges` in rank order, one greedy
    * pass per rule — EXACTLY the training-state evolution (and exactly
    * what rank-ordered non-overlapping string replaces compute, which
    * is what makes the DuckDB oracle expressible as nested `replace`).
    */
  def segment(
      docs: DataFrame,
      textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ms = merges.toIndexedSeq
    docs
      .select(explode(expr(
        s"regexp_extract_all($textCol, '$PreTokenRegex', 0)")).as("w"))
      .as[String]
      .flatMap { w =>
        ms.foldLeft(w.map(_.toString).toIndexedSeq) { case (s, (l, r)) =>
          mergeOnce(s, l, r)
        }
      }
      .toDF("tok")
  }
}
