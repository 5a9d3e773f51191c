package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit tests for EAV machinery paths the golden fixture doesn't reach:
  * multi-unit-system split naming, the pivot uniqueness guard, and
  * missing-column backfill.
  */
class FfiEavSpec extends SparkSpec {

  private lazy val s = spark

  test("unitSplit: two systems -> per-system tables with _Metric_ infix") {
    import s.implicits._
    val df = Seq(("e1", "English", "10"), ("e2", "Metric", "25"))
      .toDF("EventID", "Method_UnitSystem", "Val")
    val out = FfiEav.unitSplit(
      df, Seq("English", "Metric"), "Trees_Individuals", "Attribute",
      dropUnitColOnSplit = false).toMap
    assert(out.keySet === Set(
      "Trees_Individuals_Attribute", "Trees_Individuals_Metric_Attribute"))
    assert(out("Trees_Individuals_Metric_Attribute").select("Val").head().getString(0) === "25")
    // attribute path keeps the unit column on split tables (reference quirk)
    assert(out("Trees_Individuals_Attribute").columns.contains("Method_UnitSystem"))
  }

  test("unitSplit: single system -> one table, unit column dropped") {
    import s.implicits._
    val df = Seq(("e1", "English", "10")).toDF("EventID", "Method_UnitSystem", "Val")
    val out = FfiEav.unitSplit(df, Seq("English"), "X", "Sample", dropUnitColOnSplit = true).toMap
    assert(out.keySet === Set("X_Sample"))
    assert(!out("X_Sample").columns.contains("Method_UnitSystem"))
  }

  test("pivotUnique raises on duplicate (index, field) pairs like pandas") {
    import s.implicits._
    val dup = Seq(
      ("e1", "g1", "DBH", "10", 0L),
      ("e1", "g1", "DBH", "12", 1L)).toDF("EventID", "GUID", "F", "V", FfiExtract.IngestId)
    val ex = intercept[IllegalArgumentException] {
      FfiEav.pivotUnique(dup, Seq("EventID", "GUID"), "F", "V")
    }
    assert(ex.getMessage.contains("duplicate"))
    // non-duplicate input pivots fine with the guard on
    val ok = Seq(
      ("e1", "g1", "DBH", "10", 0L),
      ("e1", "g1", "Ht", "7", 1L)).toDF("EventID", "GUID", "F", "V", FfiExtract.IngestId)
    val wide = FfiEav.pivotUnique(ok, Seq("EventID", "GUID"), "F", "V")
    assert(wide.select("DBH", "Ht").head().toSeq === Seq("10", "7"))
  }

  test("backfill adds only missing columns as null strings") {
    import s.implicits._
    val df = Seq(("a", "b")).toDF("x", "y")
    val out = FfiEav.backfill(df, Seq("y", "z"))
    assert(out.columns.toSeq === Seq("x", "y", "z"))
    val r = out.head()
    assert(r.getString(1) === "b")
    assert(r.isNullAt(2))
  }

  test("tableName mangles method names like the reference") {
    assert(FfiEav.tableName("Trees - Individuals") === "Trees_Individuals")
    assert(FfiEav.tableName("Surface Fuels - 1000Hr") === "SurfaceFuels_1000Hr")
    assert(FfiEav.tableName("Cover - Points (metric)") === "Cover_Points_metric")
  }
}
