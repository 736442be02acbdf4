package graft

/** Pins the driver contract: entry() must work on a session that was NOT
  * built by GraftSession (the driver makes its own), and every query name
  * must have either an oracle or an intentional rows-only status. */
class SparkEntrySpec extends SparkSpec {

  test("entry() returns rows on a bare session (driver smoke contract)") {
    // fresh SessionState with the nanos conf explicitly OFF, like a session
    // the driver would build without GraftSession
    val bare = spark.newSession()
    bare.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    val df = SparkEntry.entry(bare)
    assert(df.count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("every query name is a valid identifier for result dirs") {
    assert(SparkEntry.queries.keys.forall(_.matches("[A-Za-z0-9_]+")))
  }
}
