package graft

/** Smoke guard: every declared query runs and returns rows at sf0.001
  * (the driver's t1-level check, locally enforced so an empty result
  * never ships silently).
  */
class QueriesSpec extends SparkSpec {

  SparkEntry.allQueries.foreach { q =>
    test(s"${q.name} runs and returns rows at sf0.001") {
      assert(q.run(spark, sf("sf0.001")).count() > 0)
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle name matches a query name") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
