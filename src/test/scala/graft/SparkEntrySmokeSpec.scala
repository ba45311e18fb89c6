package graft

class SparkEntrySmokeSpec extends SparkTestBase {

  test("flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query implementation") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("every query executes with a non-empty schema") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.schema.nonEmpty, s"$name: empty schema")
      assert(df.count() >= 0, s"$name: failed to execute")
    }
  }
}
