package graft.sources

import graft.SparkSpec

/** Storage-partitioned joins on lake tables: a table that declares
  * `spj.enabled` reports its hive layout as KeyGroupedPartitioning, so a
  * join keyed on the partition columns plans with NO shuffle on either
  * side — and the degenerate shapes (single live partition value, pruned
  * partition column, undeclared tables) stand down to the stock scan.
  */
class SpjSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private lazy val root: String = {
    val r = java.nio.file.Files.createTempDirectory("graft_spj").toString
    spark.conf.set("spark.sql.catalog.gspj", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gspj.root", r)
    r
  }

  private lazy val tables: Unit = {
    root
    spark.sql("""CREATE TABLE gspj.fact (p INT, k BIGINT, v DOUBLE)
                |PARTITIONED BY (p) TBLPROPERTIES ('spj.enabled' = 'true')""".stripMargin)
    spark.sql("""CREATE TABLE gspj.dim (p INT, name STRING)
                |PARTITIONED BY (p) TBLPROPERTIES ('spj.enabled' = 'true')""".stripMargin)
    spark.sql(
      """INSERT INTO gspj.fact
        |SELECT id % 8 AS p, id AS k, id * 1.5 AS v FROM range(0, 400)""".stripMargin)
    spark.sql(
      """INSERT INTO gspj.dim
        |SELECT id AS p, concat('part-', id) AS name FROM range(0, 8)""".stripMargin)
  }

  test("partition-keyed join of two spj tables plans with ZERO exchange") {
    tables
    // the merge hint keeps AQE from (correctly) broadcasting this tiny
    // test dim — at the sizes SPJ exists for, neither side broadcasts
    val joined = spark.sql(
      """SELECT /*+ MERGE(d) */ f.p, f.k, f.v, d.name FROM gspj.fact f
        |JOIN gspj.dim d ON f.p = d.p""".stripMargin)
    val plan = planOf(joined)
    assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
    assert(!plan.contains("Exchange"),
      s"co-partitioned lake join must not shuffle:\n$plan")
    val rows = joined.collect()
    assert(rows.length === 400)
    assert(rows.forall(r => r.getString(3) == s"part-${r.getInt(0)}"),
      "every fact row joins its own partition's dim row")
  }

  test("partition-keyed aggregation over one spj table plans with ZERO exchange") {
    tables
    val agg = spark.sql("SELECT p, sum(v) AS sv FROM gspj.fact GROUP BY p")
    val plan = planOf(agg)
    assert(!plan.contains("Exchange"),
      s"partition-keyed aggregation must not shuffle:\n$plan")
    assert(agg.collect().length === 8)
  }

  test("one-sided partition-value gaps fill with empty partitions (pushPartValues)") {
    tables
    // dim has values 0..7; restrict fact to 0..3 via pruning — the join
    // must still be exchange-free and correct with mismatched key sets
    val joined = spark.sql(
      """SELECT f.p, count(*) AS n FROM gspj.fact f
        |JOIN gspj.dim d ON f.p = d.p WHERE f.p < 4 GROUP BY f.p""".stripMargin)
    val rows = joined.collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(rows === Map(0 -> 50L, 1 -> 50L, 2 -> 50L, 3 -> 50L))
  }

  test("a scan pruned to ONE live partition value stands down to the stock path") {
    tables
    val one = spark.sql("SELECT k, v FROM gspj.fact WHERE p = 3")
    // correctness first; and the plan must NOT be key-grouped (a 1-key
    // grouping would serialize the scan into a single task)
    assert(one.collect().length === 50)
    assert(!planOf(one).contains("GraftKeyGroupedScan"),
      "single-partition scans must not report key grouping")
  }

  test("a projection that drops the partition column stands down") {
    tables
    val proj = spark.sql("SELECT k, v FROM gspj.fact")
    assert(!planOf(proj).contains("GraftKeyGroupedScan"),
      "partition key is unrecoverable when the partition column is pruned")
    assert(proj.collect().length === 400)
  }

  test("undeclared tables keep the stock manifest-stats scan") {
    tables
    spark.sql("""CREATE TABLE gspj.plainf (p INT, k BIGINT)
                |PARTITIONED BY (p)""".stripMargin)
    spark.sql("INSERT INTO gspj.plainf SELECT id % 4, id FROM range(0, 40)")
    val df = spark.sql("SELECT p, k FROM gspj.plainf")
    assert(!planOf(df).contains("GraftKeyGroupedScan"))
    assert(df.collect().length === 40)
  }

  test("spj.enabled can be declared and retired via ALTER TABLE") {
    tables
    spark.sql("""CREATE TABLE gspj.togl (p INT, k BIGINT)
                |PARTITIONED BY (p)""".stripMargin)
    spark.sql("INSERT INTO gspj.togl SELECT id % 4, id FROM range(0, 40)")
    spark.sql("ALTER TABLE gspj.togl SET TBLPROPERTIES ('spj.enabled' = 'true')")
    val on = spark.sql("SELECT p, k FROM gspj.togl")
    assert(planOf(on).contains("GraftKeyGroupedScan"),
      s"declared table must report key grouping:\n${planOf(on)}")
    spark.sql("ALTER TABLE gspj.togl UNSET TBLPROPERTIES ('spj.enabled')")
    val off = spark.sql("SELECT p, k FROM gspj.togl")
    assert(!planOf(off).contains("GraftKeyGroupedScan"))
  }
}
