package graft

import graft.SparkSpec

/** Driver-contract invariants: the oracle map stays in lockstep with the
  * query map, and every query at least executes on the smoke tier. */
class SparkEntrySpec extends SparkSpec {

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("every queries entry has an oracle (no rows-only exceptions left)") {
    // q93 graduated in r4 (scan outputs spooled to a fixed path the oracle
    // recomputes from); q94 graduated in r5 the same way (cell assignment
    // + probe lists pinned to parquet, both engines re-rank within them).
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty, s"queries without oracle: $rowsOnly")
  }

  test("every oracle SQL ends with a total ORDER BY (determinism rule)") {
    val bad = SparkEntry.oracleSql.filterNot(_._2.toUpperCase.contains("ORDER BY")).keys
    assert(bad.isEmpty, s"oracle without ORDER BY: $bad")
  }

  test("entry() returns rows on the smoke tier (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query executes and returns a non-empty schema on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      assert(df.schema.nonEmpty, s"$name: empty schema")
      df.count() // executes the plan; throws on any runtime error
    }
  }
}
