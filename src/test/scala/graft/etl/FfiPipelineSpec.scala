package graft.etl

import java.nio.file.Files
import java.sql.DriverManager

import graft.SparkSpec
import graft.sinks.{JdbcConstraints, MergeJdbc}
import org.apache.spark.sql.functions._

/** End-to-end golden-fixture run of the FFI pipeline: XML extract →
  * ident derivation → EAV pivots → event/project enrichment → rename
  * mapping → idempotent MERGE load into embedded Derby.
  *
  * The fixture (see FIXTURES.md §A) plants one of each semantic edge:
  * keep-first plot dedup, orphaned sample event, EAV duplicate rows,
  * StemNum repetition, species GUID lookup, team-parse delimiters with
  * EntryTeam fallback, the VisitID when-ladder, unit-system single-system
  * collapse, and FK-ordered loading.
  */
class FfiPipelineSpec extends SparkSpec {

  private val Ns = "http://ffi.example/v1"

  private def fixtureXml: String =
    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<FFIData xmlns="$Ns">
       |  <Schema_Version><Schema_Version>6.05</Schema_Version></Schema_Version>
       |  <RegistrationUnit>
       |    <RegistrationUnit_GUID>ru-1</RegistrationUnit_GUID>
       |    <RegistrationUnit_Name>Big Park Unit</RegistrationUnit_Name>
       |  </RegistrationUnit>
       |  <MacroPlot>
       |    <MacroPlot_GUID>mp-1</MacroPlot_GUID>
       |    <MacroPlot_Name>Plot 01</MacroPlot_Name>
       |    <MacroPlot_RegistrationUnit_GUID>ru-1</MacroPlot_RegistrationUnit_GUID>
       |    <MacroPlot_DateIn>2020-01-02T03:04:05</MacroPlot_DateIn>
       |  </MacroPlot>
       |  <MacroPlot>
       |    <MacroPlot_GUID>mp-1b</MacroPlot_GUID>
       |    <MacroPlot_Name>Plot 01</MacroPlot_Name>
       |    <MacroPlot_RegistrationUnit_GUID>ru-1</MacroPlot_RegistrationUnit_GUID>
       |    <MacroPlot_DateIn>2022-01-02T03:04:05</MacroPlot_DateIn>
       |  </MacroPlot>
       |  <MacroPlot>
       |    <MacroPlot_GUID>mp-2</MacroPlot_GUID>
       |    <MacroPlot_Name>Plot 02</MacroPlot_Name>
       |    <MacroPlot_RegistrationUnit_GUID>ru-1</MacroPlot_RegistrationUnit_GUID>
       |    <MacroPlot_DateIn>2021-05-06T00:00:00</MacroPlot_DateIn>
       |  </MacroPlot>
       |  <SampleEvent>
       |    <SampleEvent_GUID>se-1</SampleEvent_GUID>
       |    <SampleEvent_Plot_GUID>mp-1</SampleEvent_Plot_GUID>
       |    <SampleEvent_Date>2021-06-07T08:00:00</SampleEvent_Date>
       |  </SampleEvent>
       |  <SampleEvent>
       |    <SampleEvent_GUID>se-2</SampleEvent_GUID>
       |    <SampleEvent_Plot_GUID>mp-2</SampleEvent_Plot_GUID>
       |    <SampleEvent_Date>2021-06-08T08:00:00</SampleEvent_Date>
       |  </SampleEvent>
       |  <SampleEvent>
       |    <SampleEvent_GUID>se-3</SampleEvent_GUID>
       |    <SampleEvent_Plot_GUID>mp-404</SampleEvent_Plot_GUID>
       |    <SampleEvent_Date>2021-06-09T08:00:00</SampleEvent_Date>
       |  </SampleEvent>
       |  <ProjectUnit>
       |    <ProjectUnit_GUID>pu-1</ProjectUnit_GUID>
       |    <ProjectUnit_Name>Fire Project_A</ProjectUnit_Name>
       |  </ProjectUnit>
       |  <MonitoringStatus>
       |    <MonitoringStatus_GUID>ms-1</MonitoringStatus_GUID>
       |    <MonitoringStatus_ProjectUnit_GUID>pu-1</MonitoringStatus_ProjectUnit_GUID>
       |    <MonitoringStatus_Name>01Fire</MonitoringStatus_Name>
       |    <MonitoringStatus_Prefix>01</MonitoringStatus_Prefix>
       |    <MonitoringStatus_Base>Fire</MonitoringStatus_Base>
       |    <MonitoringStatus_Suffix>Immediate</MonitoringStatus_Suffix>
       |  </MonitoringStatus>
       |  <MonitoringStatus>
       |    <MonitoringStatus_GUID>ms-2</MonitoringStatus_GUID>
       |    <MonitoringStatus_ProjectUnit_GUID>pu-1</MonitoringStatus_ProjectUnit_GUID>
       |    <MonitoringStatus_Name>02Pre</MonitoringStatus_Name>
       |    <MonitoringStatus_Prefix>02</MonitoringStatus_Prefix>
       |    <MonitoringStatus_Base>Pre</MonitoringStatus_Base>
       |  </MonitoringStatus>
       |  <MM_MonitoringStatus_SampleEvent>
       |    <MM_MonitoringStatus_GUID>ms-1</MM_MonitoringStatus_GUID>
       |    <MM_SampleEvent_GUID>se-1</MM_SampleEvent_GUID>
       |  </MM_MonitoringStatus_SampleEvent>
       |  <MM_MonitoringStatus_SampleEvent>
       |    <MM_MonitoringStatus_GUID>ms-2</MM_MonitoringStatus_GUID>
       |    <MM_SampleEvent_GUID>se-2</MM_SampleEvent_GUID>
       |  </MM_MonitoringStatus_SampleEvent>
       |  <LocalSpecies>
       |    <LocalSpecies_GUID>aaaa-1</LocalSpecies_GUID>
       |    <LocalSpecies_Symbol>PIPO</LocalSpecies_Symbol>
       |  </LocalSpecies>
       |  <Method>
       |    <Method_GUID>m-1</Method_GUID>
       |    <Method_Name>Trees - Individuals</Method_Name>
       |    <Method_UnitSystem>English</Method_UnitSystem>
       |  </Method>
       |  <Method>
       |    <Method_GUID>m-2</Method_GUID>
       |    <Method_Name>Surface Fuels - Fine</Method_Name>
       |    <Method_UnitSystem>English</Method_UnitSystem>
       |  </Method>
       |  <MethodAttribute>
       |    <MethodAtt_ID>11</MethodAtt_ID>
       |    <MethodAtt_Method_GUID>m-1</MethodAtt_Method_GUID>
       |    <MethodAtt_FieldName>TagNo</MethodAtt_FieldName>
       |  </MethodAttribute>
       |  <MethodAttribute>
       |    <MethodAtt_ID>12</MethodAtt_ID>
       |    <MethodAtt_Method_GUID>m-1</MethodAtt_Method_GUID>
       |    <MethodAtt_FieldName>Spp</MethodAtt_FieldName>
       |  </MethodAttribute>
       |  <MethodAttribute>
       |    <MethodAtt_ID>13</MethodAtt_ID>
       |    <MethodAtt_Method_GUID>m-1</MethodAtt_Method_GUID>
       |    <MethodAtt_FieldName>DBH</MethodAtt_FieldName>
       |  </MethodAttribute>
       |  <MethodAttribute>
       |    <MethodAtt_ID>21</MethodAtt_ID>
       |    <MethodAtt_Method_GUID>m-2</MethodAtt_Method_GUID>
       |    <MethodAtt_FieldName>Transect</MethodAtt_FieldName>
       |  </MethodAttribute>
       |  <MethodAttribute>
       |    <MethodAtt_ID>22</MethodAtt_ID>
       |    <MethodAtt_Method_GUID>m-2</MethodAtt_Method_GUID>
       |    <MethodAtt_FieldName>Azimuth</MethodAtt_FieldName>
       |  </MethodAttribute>
       |  <MethodAttribute>
       |    <MethodAtt_ID>23</MethodAtt_ID>
       |    <MethodAtt_Method_GUID>m-2</MethodAtt_Method_GUID>
       |    <MethodAtt_FieldName>Slope</MethodAtt_FieldName>
       |  </MethodAttribute>
       |  <SampleAttribute>
       |    <SampleAtt_ID>31</SampleAtt_ID>
       |    <SampleAtt_Method_GUID>m-1</SampleAtt_Method_GUID>
       |    <SampleAtt_FieldName>FieldTeam</SampleAtt_FieldName>
       |  </SampleAttribute>
       |  <SampleAttribute>
       |    <SampleAtt_ID>41</SampleAtt_ID>
       |    <SampleAtt_Method_GUID>m-2</SampleAtt_Method_GUID>
       |    <SampleAtt_FieldName>FieldTeam</SampleAtt_FieldName>
       |  </SampleAttribute>
       |  <SampleAttribute>
       |    <SampleAtt_ID>42</SampleAtt_ID>
       |    <SampleAtt_Method_GUID>m-2</SampleAtt_Method_GUID>
       |    <SampleAtt_FieldName>EntryTeam</SampleAtt_FieldName>
       |  </SampleAttribute>
       |  <SampleRow>
       |    <SampleRow_ID>51</SampleRow_ID>
       |    <SampleRow_Original_GUID>srg-1</SampleRow_Original_GUID>
       |  </SampleRow>
       |  <SampleRow>
       |    <SampleRow_ID>52</SampleRow_ID>
       |    <SampleRow_Original_GUID>srg-2</SampleRow_Original_GUID>
       |  </SampleRow>
       |  <SampleData>
       |    <SampleData_SampleRow_ID>51</SampleData_SampleRow_ID>
       |    <SampleData_SampleEvent_GUID>se-1</SampleData_SampleEvent_GUID>
       |    <SampleData_SampleAtt_ID>31</SampleData_SampleAtt_ID>
       |    <SampleData_Value>Carol/Dave</SampleData_Value>
       |  </SampleData>
       |  <SampleData>
       |    <SampleData_SampleRow_ID>52</SampleData_SampleRow_ID>
       |    <SampleData_SampleEvent_GUID>se-1</SampleData_SampleEvent_GUID>
       |    <SampleData_SampleAtt_ID>41</SampleData_SampleAtt_ID>
       |    <SampleData_Value>Alice Bob</SampleData_Value>
       |  </SampleData>
       |  <SampleData>
       |    <SampleData_SampleRow_ID>52</SampleData_SampleRow_ID>
       |    <SampleData_SampleEvent_GUID>se-1</SampleData_SampleEvent_GUID>
       |    <SampleData_SampleAtt_ID>42</SampleData_SampleAtt_ID>
       |    <SampleData_Value>Alice</SampleData_Value>
       |  </SampleData>
       |  <AttributeRow>
       |    <AttributeRow_ID>61</AttributeRow_ID>
       |    <AttributeRow_DataRow_GUID>dr-1</AttributeRow_DataRow_GUID>
       |  </AttributeRow>
       |  <AttributeRow>
       |    <AttributeRow_ID>62</AttributeRow_ID>
       |    <AttributeRow_DataRow_GUID>dr-2</AttributeRow_DataRow_GUID>
       |  </AttributeRow>
       |  <AttributeRow>
       |    <AttributeRow_ID>63</AttributeRow_ID>
       |    <AttributeRow_DataRow_GUID>dr-3</AttributeRow_DataRow_GUID>
       |  </AttributeRow>
       |  <AttributeRow>
       |    <AttributeRow_ID>64</AttributeRow_ID>
       |    <AttributeRow_DataRow_GUID>dr-4</AttributeRow_DataRow_GUID>
       |  </AttributeRow>
       |  <AttributeData>
       |    <AttributeData_DataRow_ID>61</AttributeData_DataRow_ID>
       |    <AttributeData_MethodAtt_ID>11</AttributeData_MethodAtt_ID>
       |    <AttributeData_SampleRow_ID>51</AttributeData_SampleRow_ID>
       |    <AttributeData_Value>100</AttributeData_Value>
       |  </AttributeData>
       |  <AttributeData>
       |    <AttributeData_DataRow_ID>61</AttributeData_DataRow_ID>
       |    <AttributeData_MethodAtt_ID>12</AttributeData_MethodAtt_ID>
       |    <AttributeData_SampleRow_ID>51</AttributeData_SampleRow_ID>
       |    <AttributeData_Value>aaaa-1</AttributeData_Value>
       |  </AttributeData>
       |  <AttributeData>
       |    <AttributeData_DataRow_ID>61</AttributeData_DataRow_ID>
       |    <AttributeData_MethodAtt_ID>13</AttributeData_MethodAtt_ID>
       |    <AttributeData_SampleRow_ID>51</AttributeData_SampleRow_ID>
       |    <AttributeData_Value>10.5</AttributeData_Value>
       |  </AttributeData>
       |  <AttributeData>
       |    <AttributeData_DataRow_ID>62</AttributeData_DataRow_ID>
       |    <AttributeData_MethodAtt_ID>11</AttributeData_MethodAtt_ID>
       |    <AttributeData_SampleRow_ID>51</AttributeData_SampleRow_ID>
       |    <AttributeData_Value>100</AttributeData_Value>
       |  </AttributeData>
       |  <AttributeData>
       |    <AttributeData_DataRow_ID>62</AttributeData_DataRow_ID>
       |    <AttributeData_MethodAtt_ID>12</AttributeData_MethodAtt_ID>
       |    <AttributeData_SampleRow_ID>51</AttributeData_SampleRow_ID>
       |    <AttributeData_Value>aaaa-1</AttributeData_Value>
       |  </AttributeData>
       |  <AttributeData>
       |    <AttributeData_DataRow_ID>62</AttributeData_DataRow_ID>
       |    <AttributeData_MethodAtt_ID>13</AttributeData_MethodAtt_ID>
       |    <AttributeData_SampleRow_ID>51</AttributeData_SampleRow_ID>
       |    <AttributeData_Value>12.0</AttributeData_Value>
       |  </AttributeData>
       |  <AttributeData>
       |    <AttributeData_DataRow_ID>63</AttributeData_DataRow_ID>
       |    <AttributeData_MethodAtt_ID>11</AttributeData_MethodAtt_ID>
       |    <AttributeData_SampleRow_ID>51</AttributeData_SampleRow_ID>
       |    <AttributeData_Value>200</AttributeData_Value>
       |  </AttributeData>
       |  <AttributeData>
       |    <AttributeData_DataRow_ID>63</AttributeData_DataRow_ID>
       |    <AttributeData_MethodAtt_ID>12</AttributeData_MethodAtt_ID>
       |    <AttributeData_SampleRow_ID>51</AttributeData_SampleRow_ID>
       |    <AttributeData_Value>aaaa-1</AttributeData_Value>
       |  </AttributeData>
       |  <AttributeData>
       |    <AttributeData_DataRow_ID>64</AttributeData_DataRow_ID>
       |    <AttributeData_MethodAtt_ID>21</AttributeData_MethodAtt_ID>
       |    <AttributeData_SampleRow_ID>52</AttributeData_SampleRow_ID>
       |    <AttributeData_Value>1</AttributeData_Value>
       |  </AttributeData>
       |  <AttributeData>
       |    <AttributeData_DataRow_ID>64</AttributeData_DataRow_ID>
       |    <AttributeData_MethodAtt_ID>22</AttributeData_MethodAtt_ID>
       |    <AttributeData_SampleRow_ID>52</AttributeData_SampleRow_ID>
       |    <AttributeData_Value>90</AttributeData_Value>
       |  </AttributeData>
       |  <AttributeData>
       |    <AttributeData_DataRow_ID>64</AttributeData_DataRow_ID>
       |    <AttributeData_MethodAtt_ID>23</AttributeData_MethodAtt_ID>
       |    <AttributeData_SampleRow_ID>52</AttributeData_SampleRow_ID>
       |    <AttributeData_Value>5</AttributeData_Value>
       |  </AttributeData>
       |</FFIData>
       |""".stripMargin

  private lazy val transformed: FfiCatalog = {
    val dir = Files.createTempDirectory("ffi_fixture")
    val xml = dir.resolve("export.xml")
    Files.writeString(xml, fixtureXml)
    val cat = FfiExtract.extract(spark, xml.toString)
    FfiTransform(FfiIdents(cat))
  }

  test("PlotID derivation + keep-first dedup") {
    val plots = transformed("MacroPlot")
      .select("MacroPlot_GUID", "PlotID").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(plots === Map("MP-1" -> "BIGPAPLOT01", "MP-2" -> "BIGPAPLOT02"))
  }

  test("EventID derivation drops orphaned events") {
    val events = transformed("SampleEvent").select("SampleEvent_GUID", "EventID")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(events === Map(
      "SE-1" -> "BIGPAPLOT0120210607",
      "SE-2" -> "BIGPAPLOT0220210608"))
  }

  test("EAV attribute pivot: species join + StemNum + EAV dup collapse") {
    val trees = transformed("Trees_Individuals_Attribute")
      .select("AttributeData_DataRow_GUID", "TagNo", "DBH", "Species", "StemNum")
      .collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2), r.getString(3), r.getString(4))))
      .toMap
    assert(trees === Map(
      "DR-1" -> (("100", "10.5", "PIPO", "1")),
      "DR-2" -> (("100", "12.0", "PIPO", "2")),
      "DR-3" -> (("200", null, "PIPO", "1"))))
  }

  test("Transect derives from the fine-fuels attribute table") {
    val t = transformed("Transect").collect()
    assert(t.length === 1)
    val r = transformed("Transect")
      .select("EventID", "Transect", "Azimuth", "Slope", "Length").head()
    assert(r.toSeq === Seq("BIGPAPLOT0120210607", "1", "90", "5", "75"))
  }

  test("team merge: delimiters, set-union, EntryTeam fallback") {
    val se = transformed("SampleEvent")
      .filter(col("SampleEvent_GUID") === "SE-1")
      .select("FuelsObserver", "FuelsRecorder", "TreeObserver", "TreeRecorder")
      .head()
    assert(se.getString(0) === "Alice, Bob") // FieldTeam 'Alice Bob' space-split
    assert(se.getString(1) === "Alice") // EntryTeam present
    assert(se.getString(2) === "Carol, Dave") // 'Carol/Dave' slash-split
    assert(se.getString(3) === "Carol, Dave") // EntryTeam absent -> FieldTeam
  }

  test("VisitID when-ladder lands on SampleEvent and ProjectVisit") {
    val visits = transformed("SampleEvent").select("SampleEvent_GUID", "VisitID")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(visits("SE-1") === "FireProjectA202101FireImm")
    assert(visits("SE-2") === "FireProjectA202102")
    assert(transformed.contains("ProjectVisit"))
  }

  test("sample pivot carries a fresh uppercase GUID per row") {
    val s = transformed("Trees_Individuals_Sample")
      .select("SampleData_SampleRow_GUID", "FieldTeam", "SampleData_Original_GUID")
      .collect()
    assert(s.length === 1)
    assert(s(0).getString(0) === "SRG-1")
    assert(s(0).getString(1) === "Carol/Dave")
    assert(s(0).getString(2).matches("[0-9A-F-]{36}"))
  }

  test("CSV sink dumps every catalog table with headers (S11)") {
    val out = Files.createTempDirectory("ffi_csv")
    FfiCatalog(Map(
      "MacroPlot" -> transformed("MacroPlot").select("MacroPlot_GUID", "PlotID")))
      .toCsv(out.toString)
    val back = spark.read.option("header", "true").csv(s"$out/MacroPlot")
    assert(back.columns.toSeq === Seq("MacroPlot_GUID", "PlotID"))
    assert(back.count() === 2)
  }

  test("archive-on-success moves clean files only (S12)") {
    val dir = Files.createTempDirectory("ffi_archive")
    val f = dir.resolve("export.xml")
    Files.writeString(f, "<x/>")
    assert(Archive.archiveIfClean(f, Seq("SomeTable")) === None)
    assert(Files.exists(f))
    val moved = Archive.archiveIfClean(f, Nil)
    assert(moved.exists(Files.exists(_)))
    assert(!Files.exists(f))
    assert(moved.get.getParent.getFileName.toString === "processed")
  }

  test("Mapping.fromCsv reads whitespace-padded rename maps (S5)") {
    val dir = Files.createTempDirectory("ffi_maps")
    Files.writeString(dir.resolve("TableMap.csv"),
      "FFITable,NewTable\nMacroPlot , Plot\nSampleEvent,Event\n")
    Files.writeString(dir.resolve("FieldMap.csv"),
      "TableName,ColumnName,OldColumn\nPlot, PlotID , PlotID\nPlot,PlotName,MacroPlot_Name\nPlot,OnlyInDb,\n")
    val m = Mapping.fromCsv(
      spark, dir.resolve("TableMap.csv").toString, dir.resolve("FieldMap.csv").toString)
    assert(m.outputTable("MacroPlot") === Some("Plot"))
    val projected = m.project("Plot", transformed("MacroPlot"))
    assert(projected.columns.toSeq === Seq("PlotID", "PlotName"))
  }

  test("mapped tables MERGE-load into Derby idempotently, FK-ordered") {
    val url = "jdbc:derby:memory:ffidb;create=true"
    val c0 = DriverManager.getConnection(url)
    try {
      val st = c0.createStatement()
      for (t <- Seq("UPDATELOG", "EVENT", "PLOT"))
        try st.execute(s"DROP TABLE $t") catch { case _: java.sql.SQLException => () }
      st.execute("""CREATE TABLE Plot (
                   |  PlotID VARCHAR(64) PRIMARY KEY, PlotName VARCHAR(64),
                   |  AdminUnit VARCHAR(64))""".stripMargin)
      st.execute("""CREATE TABLE Event (
                   |  EventID VARCHAR(64) PRIMARY KEY,
                   |  PlotID VARCHAR(64) REFERENCES Plot (PlotID),
                   |  VisitID VARCHAR(64), FuelsObserver VARCHAR(128))""".stripMargin)
    } finally c0.close()

    val mapping = Mapping(
      tableMap = Map("MacroPlot" -> "Plot", "SampleEvent" -> "Event"),
      fieldMap = Map(
        "Plot" -> Seq(
          ("PlotID", "PlotID"), ("PlotName", "MacroPlot_Name"), ("AdminUnit", "AdminUnit")),
        "Event" -> Seq(
          ("EventID", "EventID"), ("PlotID", "PlotID"),
          ("VisitID", "VisitID"), ("FuelsObserver", "FuelsObserver"))))

    val frames = Map(
      "PLOT" -> mapping.project("Plot", transformed("MacroPlot")),
      "EVENT" -> mapping.project("Event", transformed("SampleEvent")))
    val cons = {
      val c = DriverManager.getConnection(url)
      try JdbcConstraints.reflect(c) finally c.close()
    }
    val first = MergeJdbc.loadAll(frames, cons, url, MergeJdbc.Derby)
    assert(first.forall(!_.failed), first.filter(_.failed).mkString("; "))
    assert(first.map(r => r.table -> r.inserted).toMap === Map("PLOT" -> 2L, "EVENT" -> 2L))
    val again = MergeJdbc.loadAll(frames, cons, url, MergeJdbc.Derby)
    assert(again.forall(r => !r.failed && r.inserted === 0L))
  }
}
