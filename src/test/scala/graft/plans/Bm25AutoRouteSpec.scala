package graft.plans

import graft.SparkSpec
import graft.operators.InvertedIndex
import graft.sources.{TextIndexes, VersionedLake}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Automatic BM25 routing ([[Bm25AutoRoute]] + [[graft.sources.TextIndexes]]):
  * the canonical scan-shaped BM25 aggregate plans through the persisted
  * inverted index — no corpus scan, identical answer — while structural
  * variants and stale indexes stay on the corpus.
  */
class Bm25AutoRouteSpec extends SparkSpec {

  private val Terms = Seq("hash", "vector", "stream")

  /** The exact q_bm25 plan shape (the one the rule recognizes). */
  private def scanShape(docs: DataFrame, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tok = docs.select(col("doc_id"),
      explode(graft.functions.TextExprs.wordTokens(col("text"))).as("w"))
    val lens = tok.groupBy("doc_id").agg(count(lit(1)).as("len"))
    val avgl = lens.agg(avg(col("len")).as("avgl"))
    val n = docs.select(count(lit(1)).as("n"))
    val qtok = tok.filter(col("w").isin(terms: _*))
    val dfq = qtok.groupBy("w").agg(countDistinct(col("doc_id")).as("df"))
    val tf = qtok.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    tf.join(broadcast(dfq), "w").join(lens, "doc_id")
      .crossJoin(broadcast(avgl)).crossJoin(broadcast(n))
      .select(col("doc_id"),
        round(
          log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
            (col("tf") * (k1 + 1)) /
            (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("len") / col("avgl"))),
          9).as("contrib"))
      .groupBy("doc_id")
      .agg(round(sum("contrib"), 6).as("bm25"))
  }

  private def leafPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.map(_.toUri.getPath)
          case _ => Nil
        }
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
        r.table match {
          case t: graft.sources.LakeTable => Seq(t.tableDir)
          case _                          => Nil
        }
      case sr: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        sr.relation.table match {
          case t: graft.sources.LakeTable => Seq(t.tableDir)
          case _                          => Nil
        }
    }.flatten

  private def rows(df: DataFrame): Map[Long, Double] =
    df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("the scan-shaped BM25 aggregate routes onto the index; answer identical") {
    val docsPath = s"$sf/documents.parquet"
    TextIndexes.clear()
    val docs = spark.read.parquet(docsPath)
    val direct = rows(scanShape(docs, Terms))
    val idxDir = java.nio.file.Files.createTempDirectory("bm25_route_idx").toString
    InvertedIndex.build(docs, "doc_id", "text", idxDir)
    TextIndexes.register(docsPath,
      TextIndexes.Entry(idxDir, "doc_id", "text", lakeCorpus = false))
    try {
      val routed = scanShape(spark.read.parquet(docsPath), Terms)
      val paths = leafPaths(routed)
      assert(!paths.exists(_.contains("documents.parquet")),
        s"the corpus must NOT be scanned, got: $paths")
      assert(paths.exists(_.startsWith(idxDir)),
        s"the index must serve the query, got: $paths")
      assert(rows(routed) === direct,
        "the routed answer is bit-identical to the corpus scan")
      // non-default constants route too — (k1, b) are read off the plan
      TextIndexes.clear()
      val d2 = rows(scanShape(spark.read.parquet(docsPath), Terms, k1 = 1.5, b = 0.6))
      TextIndexes.register(docsPath,
        TextIndexes.Entry(idxDir, "doc_id", "text", lakeCorpus = false))
      val routed2 = scanShape(spark.read.parquet(docsPath), Terms, k1 = 1.5, b = 0.6)
      assert(leafPaths(routed2).exists(_.startsWith(idxDir)))
      assert(rows(routed2) === d2)
      // structural variants DECLINE: a commuted tf factor is not the
      // recognized contribution, so it stays on the corpus
      val commuted = {
        val tok = spark.read.parquet(docsPath).select(col("doc_id"),
          explode(graft.functions.TextExprs.wordTokens(col("text"))).as("w"))
        val lens = tok.groupBy("doc_id").agg(count(lit(1)).as("len"))
        val avgl = lens.agg(avg(col("len")).as("avgl"))
        val n = spark.read.parquet(docsPath).select(count(lit(1)).as("n"))
        val qtok = tok.filter(col("w").isin(Terms: _*))
        val dfq = qtok.groupBy("w").agg(countDistinct(col("doc_id")).as("df"))
        val tf = qtok.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
        tf.join(broadcast(dfq), "w").join(lens, "doc_id")
          .crossJoin(broadcast(avgl)).crossJoin(broadcast(n))
          .select(col("doc_id"),
            round(
              log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
                (lit(2.2) * col("tf")) /
                (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("len") / col("avgl"))),
              9).as("contrib"))
          .groupBy("doc_id").agg(round(sum("contrib"), 6).as("bm25"))
      }
      assert(leafPaths(commuted).exists(_.contains("documents.parquet")),
        "a commuted factor is a different tree: must stay on the corpus")
    } finally TextIndexes.clear()
  }

  test("lake corpus: SQL-created index routes while fresh, declines when stale") {
    val s = spark
    TextIndexes.clear()
    val root = java.nio.file.Files.createTempDirectory("bm25_cat").toString
    s.conf.set("spark.sql.catalog.gbm", classOf[graft.sources.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.gbm.root", root)
    val docs = spark.read.parquet(s"$sf/documents.parquet").filter(col("doc_id") < 300)
    VersionedLake.commit(docs, s"$root/docs")
    s.sql("CALL gbm.system.create_text_index('docs', 'docs_idx', 'doc_id', 'text')")
      .collect()
    try {
      val fresh = scanShape(s.table("gbm.docs"), Terms)
      val paths = leafPaths(fresh)
      assert(!paths.exists(_ == s"$root/docs"), s"fresh index must serve: $paths")
      assert(rows(fresh) === rows(scanShape(VersionedLake.read(s, s"$root/docs"), Terms)))
      // a corpus commit makes the index stale: the route must decline
      // until refresh_text_index catches it up
      val s2 = s
      import s2.implicits._
      VersionedLake.appendCommit(
        Seq((9901L, "vector hash stream vector", "en", "web", 25L))
          .toDF("doc_id", "text", "lang", "source", "n_chars"), s"$root/docs")
      val stale = scanShape(s.table("gbm.docs"), Terms)
      assert(leafPaths(stale).exists(_ == s"$root/docs"),
        "a stale index must never serve - the corpus scan answers")
      s.sql("CALL gbm.system.refresh_text_index('docs')").collect()
      val refreshed = scanShape(s.table("gbm.docs"), Terms)
      assert(!leafPaths(refreshed).exists(_ == s"$root/docs"),
        "after refresh the index serves again")
      assert(rows(refreshed) ===
        rows(scanShape(VersionedLake.read(s, s"$root/docs"), Terms)))
    } finally TextIndexes.clear()
  }
}
