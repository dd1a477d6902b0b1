package graft

/** Smoke: every registered query runs at sf0.001 and returns rows, and
  * every oracle key refers to a real query (driver-gate hygiene).
  */
class QueriesSmokeSpec extends SparkTestBase {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracles without queries: $dangling")
  }

  test("every query has an oracle — rows-only checks cannot enter the registry") {
    // the round-11 failure mode, made structurally impossible: a query
    // registered without its DuckDB mirror would downgrade the driver's
    // hash gate to a rows-only check for that entry. Registration and
    // oracle land together or not at all.
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, sf)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }
}
