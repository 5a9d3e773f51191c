package graft.plans

import graft.SparkSpec
import graft.sources.GraftCatalog

/** Positional retrieval as SQL table functions:
  * `phrase_search(corpus, phrase[, k])` / `near_search(corpus, terms,
  * window[, k])` in a FROM clause. The corpus argument takes a string
  * literal OR an unquoted table identifier; `k` bounds the probe itself
  * (ordered top-k, the procedure face's contract). Resolution failures
  * are ANALYSIS errors that say what to do — never a raw MatchError.
  */
class TextSearchTvfSpec extends SparkSpec {

  private lazy val root: String = {
    val r = java.nio.file.Files.createTempDirectory("graft_tvf").toString
    spark.conf.set("spark.sql.catalog.gtvf", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gtvf.root", r)
    spark.sql("CREATE TABLE gtvf.corp (doc_id BIGINT, body STRING)")
    spark.sql("""INSERT INTO gtvf.corp VALUES
                |(1, 'scan scan scan'), (2, 'scan scan only here'),
                |(3, 'join scan'), (4, 'nothing')""".stripMargin)
    spark.sql("CALL gtvf.system.create_text_index('corp', 'corp_idx', 'doc_id', 'body')")
    r
  }

  test("identifier corpus argument resolves like the string literal") {
    root
    val byName = spark.sql(
      "SELECT doc_id, n_phrase FROM phrase_search(`gtvf`.`corp`, 'scan scan') ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val byString = spark.sql(
      "SELECT doc_id, n_phrase FROM phrase_search('gtvf.corp', 'scan scan') ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(byName === byString && byName === Seq((1L, 2L), (2L, 1L)))
  }

  test("per-call k bounds the probe: ordered top-k, plan keeps the limit") {
    root
    val df = spark.sql(
      "SELECT doc_id, n_phrase FROM phrase_search('gtvf.corp', 'scan scan', 1)")
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      === Seq((1L, 2L)), "k=1 keeps the top doc by (count desc, doc_id)")
    val near = spark.sql(
      "SELECT doc_id FROM near_search('gtvf.corp', 'join scan', 2, 1)")
      .collect().map(_.getLong(0)).toSeq
    assert(near === Seq(3L))
    val bad = intercept[Exception](spark.sql(
      "SELECT * FROM phrase_search('gtvf.corp', 'scan scan', 0)").collect())
    assert(bad.getMessage.contains("k must be >= 1"), bad.getMessage)
  }

  test("a resolvable non-corpus table refuses with the registration hint, never a MatchError") {
    root
    spark.sql("CREATE TABLE gtvf.plain (x BIGINT)")
    val e = intercept[Exception](spark.sql(
      "SELECT * FROM phrase_search('gtvf.plain', 'a b')").collect())
    assert(e.getMessage.contains("create_text_index"), e.getMessage)
    assert(!e.getMessage.contains("MatchError"))
    // a time-travel pin is not a servable corpus either: same clear error
    val e2 = intercept[Exception](spark.sql(
      "SELECT * FROM phrase_search('no.such.table', 'a b')").collect())
    assert(e2.getMessage.contains("neither a registered text-index corpus") ||
      e2.getMessage.contains("create_text_index"), e2.getMessage)
  }
}
