package graft

/** Pins the bench prep registry: every named memo builder runs clean on
  * the test data (a broken prep item would otherwise surface only as a
  * driver-bench `prep:*` error line), names are unique (duplicate keys
  * would silently overwrite each other's timings in the bench JSON),
  * and a second pass is memo-hit cheap — the registry must force
  * session caches, not re-run corpus work per call.
  */
class PrepSpec extends SparkTestBase {

  test("prep items: unique names, every builder runs, second pass is a memo hit") {
    val names = Prep.items.map(_._1)
    assert(names.distinct == names, s"duplicate prep names: $names")
    Prep.items.foreach { case (name, fn) =>
      try fn(spark, sf)
      catch { case e: Throwable => fail(s"prep $name failed: $e") }
    }
    // memoized: the second full pass must do no corpus-sized work. Wall
    // time is load-sensitive, so pin on Spark JOBS instead: a memo hit
    // runs zero jobs (values are cached holders / sealed checkpoints).
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    Prep.items.foreach { case (_, fn) => fn(spark, sf) }
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after == before,
      s"second prep pass launched ${after - before} jobs — a memo is not memoizing")
  }
}
