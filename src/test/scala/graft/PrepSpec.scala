package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

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
    // Counted with a dedicated listener, NOT statusTracker job-id
    // diffs: the AppStatusStore evicts completed jobs past
    // spark.ui.retainedJobs (default 1000), so once the shared-session
    // suite crosses that cap a count diff plateaus and would pass even
    // when the second pass launches jobs.
    val jobs = new AtomicInteger
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(): Unit
      }
    }
    // the listener bus is async: quiesce (no new JobStart for 300 ms)
    // before snapshotting so stragglers from the first pass — or from a
    // concurrently-initialized lazy in another suite — don't land inside
    // the measured window
    def quiesce(): Int = {
      var prev = -1
      var cur = jobs.get
      while (cur != prev) { Thread.sleep(300); prev = cur; cur = jobs.get }
      cur
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val before = quiesce()
      Prep.items.foreach { case (_, fn) => fn(spark, sf) }
      val after = quiesce()
      assert(after == before,
        s"second prep pass launched ${after - before} jobs — a memo is not memoizing")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
