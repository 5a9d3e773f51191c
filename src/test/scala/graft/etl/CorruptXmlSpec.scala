package graft.etl

import graft.SparkSpec

/** Malformed-input tolerance: a bad row (or a bad region) in a 100 TB
  * backfill must be quarantined, not kill the job — the reference's
  * whole-DOM `ET.parse` dies on the first bad byte.
  */
class CorruptXmlSpec extends SparkSpec {

  private def write(body: String): String = {
    val f = java.nio.file.Files.createTempDirectory("cx").resolve("f.xml")
    java.nio.file.Files.writeString(f, body)
    f.toString
  }

  test("a row-local error (bad entity) quarantines only that row") {
    val path = write(
      """<FFIData>
        |  <Plot><Plot_GUID>aa</Plot_GUID><Name>one</Name></Plot>
        |  <Plot><Plot_GUID>bb</Plot_GUID><Name>two & broken</Name></Plot>
        |  <Plot><Plot_GUID>cc</Plot_GUID><Name>three</Name></Plot>
        |</FFIData>""".stripMargin)
    val (clean, quarantined) = FfiExtract.readTableTolerant(spark, path, "Plot")
    val names = clean.select("Name").collect().map(_.getString(0)).toSet
    assert(names === Set("one", "three"))
    assert(quarantined.count() === 1)
    // the quarantine row keeps the fields parsed before the failure —
    // enough to identify WHICH record needs re-export
    val bad = quarantined.select("Plot_GUID").collect().map(_.getString(0)).toSet
    assert(bad === Set("bb"))
  }

  test("a structural break degrades to quarantine from the break on — never a job failure") {
    val path = write(
      """<FFIData>
        |  <Plot><Plot_GUID>aa</Plot_GUID><Name>one</Name></Plot>
        |  <Plot><Plot_GUID>bb</Plot_GUID><Name>two</baddtag></Plot>
        |  <Plot><Plot_GUID>cc</Plot_GUID><Name>three</Name></Plot>
        |</FFIData>""".stripMargin)
    // the tokenizer cannot re-sync past a mismatched close tag: rows from
    // the break onward collapse into corrupt records. The contract is
    // weaker than per-row quarantine but strictly stronger than the
    // reference: intact-prefix rows load, nothing fails, nothing is
    // silently dropped.
    val (clean, quarantined) = FfiExtract.readTableTolerant(spark, path, "Plot")
    val names = clean.select("Name").collect().map(_.getString(0)).toSet
    assert(names === Set("one"))
    assert(quarantined.count() >= 1)
  }

  test("FAILFAST surfaces the same input as an error (strict validation path)") {
    val path = write(
      """<FFIData>
        |  <Plot><Plot_GUID>aa</Plot_GUID><Name>one & broken</Name></Plot>
        |</FFIData>""".stripMargin)
    // FAILFAST already throws during the load's field-discovery pass
    intercept[Exception] {
      spark.read
        .format("xml")
        .option("rowTag", "Plot")
        .option("inferSchema", "false")
        .option("mode", "FAILFAST")
        .load(path)
        .collect()
    }
  }
}
