package graft.engine

import org.scalatest.funsuite.AnyFunSuite

class DbConfigSpec extends AnyFunSuite {

  private val ini =
    """; local connections — mirrors the reference's config.ini shape
      |[LocalMSSQL]
      |type = SQLServer
      |driver = com.microsoft.sqlserver.jdbc.SQLServerDriver
      |user = ffi
      |password = s3cret
      |server = db.example.org
      |database = FFI_Data
      |
      |# a second dialect
      |[LocalPG]
      |type: PostgreSQL
      |user: pg
      |password: pw
      |server: pg.example.org:5432
      |database: ffi
      |
      |[Weird]
      |type = oracle
      |server = x
      |database = y
      |""".stripMargin

  test("sqlserver section builds the jdbc:sqlserver form with credentials in props") {
    val c = DbConfig.fromIni(ini, "LocalMSSQL").get
    assert(c.url === "jdbc:sqlserver://db.example.org;databaseName=FFI_Data")
    assert(c.props.getProperty("user") === "ffi")
    assert(c.props.getProperty("password") === "s3cret")
    assert(c.props.getProperty("driver") === "com.microsoft.sqlserver.jdbc.SQLServerDriver")
    assert(!c.url.contains("s3cret"), "credentials must never be URL-interpolated")
  }

  test("postgresql section builds the jdbc:postgresql form; colon pairs parse") {
    val c = DbConfig.fromIni(ini, "LocalPG").get
    assert(c.url === "jdbc:postgresql://pg.example.org:5432/ffi")
    assert(c.props.getProperty("user") === "pg")
    assert(c.props.getProperty("driver") === null)
  }

  test("unrecognized dialect yields None, like the reference's empty string") {
    assert(DbConfig.fromIni(ini, "Weird").isEmpty)
    assert(DbConfig.fromIni(ini, "NoSuchSection").isEmpty)
  }

  test("dispatch is case-insensitive substring, as in the reference") {
    val c = DbConfig.fromSection(Map(
      "type" -> "postgresql+psycopg2", "server" -> "h", "database" -> "d"))
    assert(c.get.url === "jdbc:postgresql://h/d")
  }
}
