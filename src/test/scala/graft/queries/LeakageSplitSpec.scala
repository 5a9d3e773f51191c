package graft.queries

import graft.SparkSpec
import graft.SparkEntry
import org.apache.spark.sql.functions._

/** The contamination guard behind `q_split_leakage_safe`: a train/test
  * split keyed on the dup-group canonical can never place two
  * near-identical documents on opposite sides of the boundary — the
  * failure a per-document hash split (q_train_test_split's shape, correct
  * for ROW sampling) does commit on a corpus with planted near-dups.
  */
class LeakageSplitSpec extends SparkSpec {

  test("no dup group straddles the split; the per-doc key provably would") {
    val s = spark
    val out = SparkEntry.queries("q_split_leakage_safe")(s, sf)
    val groups = out.groupBy("canonical_id").agg(
      count(lit(1)).as("n"),
      countDistinct(col("split")).as("splits"),
      countDistinct( // the naive key: md5 of the DOCUMENT id
        when(substring(md5(col("doc_id").cast("string")), 1, 1) < "c", "train")
          .otherwise("test")).as("naive_splits"))
    val multi = groups.filter(col("n") > 1).collect()
    assert(multi.nonEmpty, "fixture must contain multi-document dup groups")
    assert(multi.forall(_.getLong(multi.head.fieldIndex("splits")) == 1L),
      "a dup group split across train and test IS the leak")
    assert(multi.exists(_.getLong(multi.head.fieldIndex("naive_splits")) > 1L),
      "the per-document key must demonstrate the straddle this query prevents")
    // both sides populated — the canonical keying didn't collapse the split
    val sides = out.select("split").distinct().collect().map(_.getString(0)).toSet
    assert(sides === Set("train", "test"))
  }
}
