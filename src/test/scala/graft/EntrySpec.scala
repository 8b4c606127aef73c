package graft

/** The driver's smoke check, held in-suite: SparkEntry.entry must
  * return rows on the sf0.001 testdata, and every oracleSql key must
  * name a registered query (a dangling oracle would make the driver
  * grade a query that doesn't exist). */
class EntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001 (driver smoke contract)") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory,
      "driver testdata not present")
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key is a registered query and vice-versa gaps are the documented no-oracle rows") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert((os -- qs).isEmpty, s"oracles without queries: ${os -- qs}")
    val noOracle = qs -- os
    assert(noOracle === Set("q_agg_approx_distinct"),
      s"undocumented no-oracle queries: $noOracle")
  }
}
