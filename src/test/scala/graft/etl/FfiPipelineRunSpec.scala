package graft.etl

import java.nio.file.Files
import java.sql.DriverManager

import graft.SparkSpec
import graft.sinks.MergeJdbc

/** E1 driver loop: directory batch → per-file load → archive-on-success,
  * then a second poll sees an empty directory.
  */
class FfiPipelineRunSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:ffirundb;create=true"

  test("runDirectory loads every export and archives clean files") {
    val c0 = DriverManager.getConnection(url)
    try {
      val st = c0.createStatement()
      for (t <- Seq("UPDATELOG", "EVENT", "PLOT"))
        try st.execute(s"DROP TABLE $t") catch { case _: java.sql.SQLException => () }
      st.execute("CREATE TABLE Plot (PlotID VARCHAR(64) PRIMARY KEY, PlotName VARCHAR(64))")
      st.execute("""CREATE TABLE Event (EventID VARCHAR(64) PRIMARY KEY,
                   |  PlotID VARCHAR(64) REFERENCES Plot (PlotID))""".stripMargin)
    } finally c0.close()

    val mapping = Mapping(
      tableMap = Map("MacroPlot" -> "Plot", "SampleEvent" -> "Event"),
      fieldMap = Map(
        "Plot" -> Seq(("PlotID", "PlotID"), ("PlotName", "MacroPlot_Name")),
        "Event" -> Seq(("EventID", "EventID"), ("PlotID", "PlotID"))))

    val dataDir = Files.createTempDirectory("ffi_run")
    Files.writeString(dataDir.resolve("export1.xml"), FfiFixture.Xml)

    val results = FfiPipeline.runDirectory(spark, dataDir, mapping, url, MergeJdbc.Derby)
    assert(results.size === 1)
    val fr = results.head
    assert(fr.failedTables.isEmpty, fr.tables.mkString("; "))
    assert(fr.tables.map(t => t.table -> t.inserted).toMap ===
      Map("PLOT" -> 2L, "EVENT" -> 2L))
    assert(fr.archived.isDefined)
    assert(!Files.exists(dataDir.resolve("export1.xml")))
    assert(Files.exists(dataDir.resolve("processed").resolve("export1.xml")))

    // second poll: nothing left to do
    assert(FfiPipeline.runDirectory(spark, dataDir, mapping, url, MergeJdbc.Derby).isEmpty)
  }
}
