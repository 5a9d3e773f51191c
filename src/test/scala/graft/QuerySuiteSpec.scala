package graft

/** Smoke: every declared query runs at sf0.001 and yields rows; every oracle
  * key points at a declared query. (Value-level equivalence vs DuckDB is
  * checked by tools/selfcheck.py / the round driver — DuckDB isn't on the
  * JVM classpath.)
  */
class QuerySuiteSpec extends SparkSpec {

  test("oracleSql keys are a subset of queries") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("query names are unique (Map construction would silently drop dups)") {
    val names = SparkEntry.all.map(_.name)
    assert(names.distinct.size === names.size,
      names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }.mkString(", "))
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.all.foreach { q =>
    test(s"${q.name} runs and returns rows at sf0.001") {
      assert(q.fn(spark, sf).count() > 0, s"${q.name} returned 0 rows")
    }
  }
}
