package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Source/sink completeness beyond parquet: ORC, CSV and JSON round-trips
  * over a real test table. ORC preserves types natively; CSV and JSON are
  * schema-on-read (the reader is handed the writer's schema — the
  * production contract for text formats, where type recovery by inference
  * is a correctness bug, not a feature).
  */
class FormatsSpec extends SparkSpec {

  private lazy val orders = spark.read.parquet(s"$sf/orders.parquet")

  private def canon(df: DataFrame): Set[String] =
    df.orderBy("o_orderkey")
      .collect()
      .map(_.mkString("|"))
      .toSet

  private def roundTrip(fmt: String, write: String => Unit, read: String => DataFrame): Unit = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_$fmt").toString + "/t"
    write(dir)
    val back = read(dir)
    assert(back.schema === orders.schema, s"$fmt schema drift")
    assert(canon(back) === canon(orders), s"$fmt values drift")
  }

  test("ORC round-trip preserves schema and values") {
    roundTrip(
      "orc",
      dir => orders.write.orc(dir),
      dir => spark.read.orc(dir))
  }

  test("CSV round-trip with explicit schema and ISO timestamps") {
    roundTrip(
      "csv",
      dir =>
        orders.write
          .option("header", "true")
          .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
          .csv(dir),
      dir =>
        spark.read
          .schema(orders.schema)
          .option("header", "true")
          .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
          .csv(dir))
  }

  test("JSON lines round-trip with explicit schema") {
    roundTrip(
      "json",
      dir => orders.write.json(dir),
      dir => spark.read.schema(orders.schema).json(dir))
  }

  test("parquet schema evolution: mergeSchema unions columns, old rows null-backfill") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve").toString + "/t"
    Seq((1L, "a")).toDF("id", "v").write.parquet(dir)
    Seq((2L, "b", 0.5)).toDF("id", "v", "score").write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted === Array("id", "score", "v"))
    val rows = merged.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(rows === Array((1L, "a", None), (2L, "b", Some(0.5))),
      "pre-evolution rows must read with the new column null")
  }

  test("CSV quoting survives delimiters and quotes inside fields") {
    val s = spark
    import s.implicits._
    val tricky = Seq(
      (1L, "plain"),
      (2L, "comma, inside"),
      (3L, "\"quoted\" text"),
      (4L, "both, \"of\" them")).toDF("id", "txt")
    val dir = java.nio.file.Files.createTempDirectory("graft_csvq").toString + "/t"
    tricky.write.option("header", "true").csv(dir)
    val back = spark.read.schema(tricky.schema).option("header", "true").csv(dir)
    assert(back.orderBy("id").collect().map(_.getString(1)).toSeq ===
      tricky.orderBy("id").collect().map(_.getString(1)).toSeq)
  }
}
