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

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.all.foreach { q =>
    test(s"${q.name} runs and returns rows at sf0.001") {
      assert(q.fn(spark, sf).count() > 0, s"${q.name} returned 0 rows")
    }
  }
}
