package graft

/** Driver-contract smoke: entry() answers on sf0.001 (the t1 gate). */
class EntrySpec extends GraftSuite {
  test("entry returns rows on sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }

  test("every query has an oracle and every oracle has a query") {
    assert(SparkEntry.oracleSql.keySet === SparkEntry.queries.keySet)
  }
}
