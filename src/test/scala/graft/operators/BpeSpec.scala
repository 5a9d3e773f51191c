package graft.operators

import graft.SparkSpec

/** BPE merge-rule training against an independently-written driver
  * reference (same tie-break contract: count desc, left asc, right
  * asc), plus pins for the greedy non-overlapping pass semantics the
  * DuckDB oracle's nested `replace` relies on.
  */
class BpeSpec extends SparkSpec {

  /** Driver reference: plain-Scala trainer over a word histogram. */
  private def refTrain(
      words: Map[String, Long], numMerges: Int): Seq[(String, String)] = {
    var state: Map[IndexedSeq[String], Long] =
      words.groupBy { case (w, _) => w.map(_.toString).toIndexedSeq }
        .map { case (k, m) => k -> m.values.sum }
    val out = Seq.newBuilder[(String, String)]
    for (_ <- 1 to numMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      state.foreach { case (syms, n) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + n
          case _         =>
        }
      }
      if (counts.nonEmpty) {
        val (l, r) = counts.toSeq
          .sortBy { case ((a, b), c) => (-c, a, b) }.head._1
        out += ((l, r))
        state = state.groupBy { case (syms, _) => refMergeOnce(syms, l, r) }
          .map { case (k, m) => k -> m.values.sum }
      }
    }
    out.result()
  }

  private def refMergeOnce(
      syms: IndexedSeq[String], l: String, r: String): IndexedSeq[String] = {
    val b = IndexedSeq.newBuilder[String]
    var i = 0
    while (i < syms.length)
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        b += (l + r); i += 2
      } else { b += syms(i); i += 1 }
    b.result()
  }

  test("greedy pass is non-overlapping left-to-right: 'aaa' under (a,a) -> [aa, a]") {
    assert(Bpe.mergeOnce(IndexedSeq("a", "a", "a"), "a", "a") === IndexedSeq("aa", "a"))
    assert(Bpe.mergeOnce(IndexedSeq("a", "a", "a", "a"), "a", "a") ===
      IndexedSeq("aa", "aa"))
    assert(Bpe.mergeOnce(IndexedSeq("x", "a", "b", "a", "b"), "a", "b") ===
      IndexedSeq("x", "ab", "ab"))
  }

  test("train matches the driver reference on a known corpus, merges in order") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      "low low low lower lowest",
      "new newer newest low").toDF("text")
    val got = Bpe.train(docs, "text", 8)
    // reference over the SAME pre-tokenization
    val words = docs.as[String].collect()
      .flatMap(t => Bpe.PreTokenRegex.r.findAllIn(t))
      .groupBy(identity).map { case (w, a) => w -> a.length.toLong }
    val want = refTrain(words, 8)
    assert(got === want,
      s"distributed trainer must agree with the reference trainer\n got=$got\nwant=$want")
  }

  test("segment replays the merges; token mass is conserved") {
    val s = spark
    import s.implicits._
    val docs = Seq("banana band ana", "banana banana").toDF("text")
    val merges = Bpe.train(docs, "text", 6)
    val toks = Bpe.segment(docs, "text", merges)
    // conservation: concatenating tokens per corpus reproduces the
    // pre-token character mass exactly
    val tokChars = toks.as[String].collect().map(_.length).sum
    val preChars = docs.as[String].collect()
      .flatMap(t => Bpe.PreTokenRegex.r.findAllIn(t)).map(_.length).sum
    assert(tokChars === preChars, "no characters created or destroyed")
    // and every token is either a learned symbol or a single char
    val vocab = merges.map { case (l, r) => l + r }.toSet
    assert(toks.as[String].collect().forall(t => t.length == 1 || vocab.contains(t)),
      "multi-char tokens must be learned merge products")
  }

  test("deterministic tie-break: equal counts break on (left, right) ascending") {
    val s = spark
    import s.implicits._
    // "xy" and "yz" both appear exactly twice and share no overlap
    val docs = Seq("xy yz xy yz").toDF("text")
    val got = Bpe.train(docs, "text", 1)
    // pairs: (space-prefixed variants differ) — the lexicographically
    // smallest of the maximal-count pairs must win
    assert(got.size === 1)
    val ref = refTrain(
      docs.as[String].collect()
        .flatMap(t => Bpe.PreTokenRegex.r.findAllIn(t))
        .groupBy(identity).map { case (w, a) => w -> a.length.toLong },
      1)
    assert(got === ref)
  }
}
