package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackSpec extends SparkSpec {

  private def toks = spark.read.parquet(s"$sf/documents.parquet")
    .select(
      col("doc_id"),
      size(regexp_extract_all(lower(col("text")), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))
        .cast("long").as("tok"))

  test("token mass is conserved per document") {
    val packed = Pack.packChunks(toks, "doc_id", "tok", 512L, col("doc_id"))
    val perDoc = packed.groupBy("doc_id").agg(sum("tok_in_chunk").as("got"))
    val bad = perDoc.join(toks, "doc_id").filter(col("got") =!= col("tok")).count()
    assert(bad === 0L)
  }

  test("every chunk except the last carries exactly seqLen tokens") {
    val packed = Pack.packChunks(toks, "doc_id", "tok", 512L, col("doc_id"))
    val perChunk = packed.groupBy("chunk_id").agg(sum("tok_in_chunk").as("n")).collect()
    val lastChunk = perChunk.map(_.getLong(0)).max
    perChunk.foreach { r =>
      if (r.getLong(0) != lastChunk)
        assert(r.getLong(1) === 512L, s"chunk ${r.getLong(0)} has ${r.getLong(1)} tokens")
    }
  }

  test("result is invariant to the input's incoming partitioning") {
    val a = Pack.packChunks(toks.repartition(1), "doc_id", "tok", 512L, col("doc_id"))
    val b = Pack.packChunks(toks.repartition(7), "doc_id", "tok", 512L, col("doc_id"))
    assert(a.exceptAll(b).count() === 0L)
    assert(b.exceptAll(a).count() === 0L)
  }

  test("zero-token documents occupy no chunk") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 5L), (2L, 0L), (3L, 3L)).toDF("doc_id", "tok")
    val packed = Pack.packChunks(df, "doc_id", "tok", 4L, col("doc_id")).collect()
    assert(!packed.map(_.getLong(0)).contains(2L))
    // doc 1: tokens [0,5) spans chunks 0,1; doc 3: [5,8) spans chunk 1
    assert(packed.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet ===
      Set((1L, 0L, 4L), (1L, 1L, 1L), (3L, 1L, 3L)))
  }

  private def langToks = spark.read.parquet(s"$sf/documents.parquet")
    .select(
      col("lang"),
      col("doc_id"),
      size(regexp_extract_all(lower(col("text")), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))
        .cast("long").as("tok"))

  test("grouped packing equals independent per-group global packing") {
    val grouped = Pack
      .packChunksByGroup(langToks, "lang", "doc_id", "tok", 512L, col("doc_id"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val langs = langToks.select("lang").distinct().collect().map(_.getString(0))
    assert(langs.length > 1, "fixture must span several languages")
    val perLang = langs.flatMap { g =>
      Pack.packChunks(
        langToks.filter(col("lang") === g), "doc_id", "tok", 512L, col("doc_id"))
        .collect().map(r => (g, r.getLong(0), r.getLong(1), r.getLong(2)))
    }.toSet
    assert(grouped === perLang,
      "per-group offsets must match running each group through the global packer alone")
  }

  test("grouped packing: chunk ids restart at 0 inside every group") {
    val firsts = Pack
      .packChunksByGroup(langToks, "lang", "doc_id", "tok", 512L, col("doc_id"))
      .groupBy("lang").agg(min("chunk_id").as("first_chunk"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(firsts.values.forall(_ == 0L), s"every group must start at chunk 0: $firsts")
  }

  test("grouped packing is invariant to the input's incoming partitioning") {
    def run(parts: Int) = Pack
      .packChunksByGroup(langToks.repartition(parts), "lang", "doc_id", "tok", 512L, col("doc_id"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(run(2) === run(17))
  }
}
