package graft.queries

import graft.SparkSpec
import graft.functions.TextExprs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact-substring decontamination vs the shingle-set face: a verbatim
  * benchmark span embedded mid-document dilutes to a tiny OVERLAP
  * FRACTION (set face scores it clean) but every one of its 8-token runs
  * matches exactly (positional face catches it, with the offset).
  */
class DecontaminateSpec extends SparkSpec {

  private val s = spark
  import s.implicits._

  // a 10-token benchmark answer span
  private val span =
    "the quick brown fox jumps over the lazy sleeping dog"
  // 100 filler tokens, no 8-token run shared with the span
  private def filler(seed: String): String =
    (0 until 100).map(i => s"$seed$i").mkString(" ")

  private val benchDocs = Seq(
    (1L, s"benchmark question alpha $span benchmark answer omega"))
    .toDF("doc_id", "text")
  private val corpusDocs = Seq(
    // span pasted verbatim mid-document
    (10L, filler("pre") + " " + span + " " + filler("post")),
    // shares scattered WORDS with the span but no 8-token run
    (11L, "the dog and the fox are quick but lazy " + filler("clean")))
    .toDF("doc_id", "text")

  private def benchGrams(n: Int): DataFrame =
    benchDocs.select(explode(TextExprs.wordShingles(col("text"), n)).as("g")).distinct()

  test("wordShinglesAll is positional: element i is the n-token run at offset i") {
    val arr = Seq("a B c a b").toDF("text")
      .select(TextExprs.wordShinglesAll(col("text"), 2).as("sh"))
      .head().getSeq[String](0)
    assert(arr === Seq("a b", "b c", "c a", "a b"),
      "order and multiplicity must both be preserved (wordShingles dedups)")
  }

  test("set-overlap face dilutes an embedded span below any plausible threshold") {
    val contam = corpusDocs
      .select(col("doc_id"),
        explode(TextExprs.wordShingles(col("text"), 2)).as("s"))
      .join(broadcast(benchGrams(2).withColumnRenamed("g", "s")
        .withColumn("hit", lit(1))), Seq("s"), "left")
      .groupBy("doc_id")
      .agg((count(col("hit")) * 1.0 / count(lit(1))).as("contam"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(contam(10L) < 0.15,
      s"the 10-token span inside ~210 tokens must dilute; got ${contam(10L)}")
  }

  test("exact positional face catches the verbatim span at its offset; clean doc scores 0") {
    val hits = corpusDocs
      .select(col("doc_id"), posexplode(
        TextExprs.wordShinglesAll(col("text"), 8)).as(Seq("pos", "g")))
      .join(broadcast(benchGrams(8).withColumn("hit", lit(1))), Seq("g"), "left")
      .groupBy("doc_id")
      .agg(count(col("hit")).as("n_exact_hits"),
        min(when(col("hit").isNotNull, col("pos"))).as("first_hit"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) -1 else r.getInt(2)))).toMap

    // span = 10 tokens at token offset 100 → its 8-gram runs start at
    // offsets 100, 101, 102 (3 fully-inside runs; boundary runs mix
    // filler so only fully-verbatim ones can match)
    assert(hits(10L)._1 === 3L,
      s"expected the 3 fully-inside 8-gram runs to match, got ${hits(10L)}")
    assert(hits(10L)._2 === 100,
      s"first verbatim run must sit at the paste offset, got ${hits(10L)}")
    assert(hits(11L) === ((0L, -1)),
      "scattered shared words must NOT count as exact contamination")
  }
}
