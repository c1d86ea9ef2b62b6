package graft

/** Driver-contract smoke spec: `SparkEntry.entry` must return rows on the
  * sf0.001 fixtures, and every declared query must have either an oracle or
  * a documented exemption (x33's sketches are engine-specific by design).
  */
class EntrySpec extends SparkSpec {

  test("entry (flagship corpus curation) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).limit(1).count() == 1)
  }

  test("every query has an oracle except the declared sketch exemption") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle == Set("x33_approx_stats"), s"unexpected: $noOracle")
    val danglingOracle = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(danglingOracle.isEmpty, s"oracle without query: $danglingOracle")
  }
}
