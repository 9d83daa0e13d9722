package graft

/** Smoke-level contract checks over the full SURVEY.md §2 inventory:
  * every declared query runs at sf0.001 and yields rows; every query
  * has a DuckDB oracle registered. (Value-level correctness is the
  * driver's DuckDB compare — replicated locally by tools/parity.py.)
  */
class QueriesSpec extends SparkSpec {

  test("every query has an oracle") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("every oracle has a query") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracles without query: $dangling")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, sf)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }
}
