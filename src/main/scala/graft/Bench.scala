package graft
/** Driver-run benchmark: every SparkEntry query timed end-to-end
  * (plan + execute + count) on SPARK_GRAFT_SF_DIR; one JSON line out.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    // cumulative task-level shuffle-write / spill counters, registered
    // BEFORE the warmup so queued warmup events can't bleed into the
    // first query's delta (late-added listeners receive in-flight events)
    val shuffleW = new java.util.concurrent.atomic.AtomicLong
    val spillB = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          shuffleW.addAndGet(m.shuffleWriteMetrics.bytesWritten): Unit
          spillB.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled): Unit
        }
      }
    })
    // warm the parquet footers + JIT once so per-query numbers measure the
    // query, not first-touch costs (the driver compares totals; keep it in)
    Tables.names.foreach(n =>
      try Tables(spark, sfDir, n).count() catch { case _: Throwable => () })
    // drain warmup task-end events before baselining — deterministic,
    // unlike a sleep (the listener bus is async)
    org.apache.spark.sql.GraftBridge.drainListeners(spark.sparkContext)
    val spillBase = spillB.get
    // failures surface: stack trace to stderr, the query's time slot is
    // -1 in the JSON (unmistakable vs a real duration), and the names
    // ride along in an "errors" array — a broken query must never bench
    // as merely fast
    // optional args: query-name prefixes to bench a subset (dev loops)
    val prefixes = args.toSeq
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => prefixes.isEmpty || prefixes.exists(name.startsWith) }
    // an unmatched prefix must not masquerade as an impossibly fast
    // clean run (total=0, no errors)
    require(selected.nonEmpty,
      s"no query matches prefixes ${prefixes.mkString("[", ", ", "]")} — " +
        s"known queries: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    // per-query deltas of the cumulative counters are exact: the bus is
    // drained after every query (outside the timed span), so no
    // straggler task-end event can land on the next query's row; a
    // FAILED query still records its delta so its bytes don't inflate
    // the next query's row
    val shuffle = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    val results = selected.map { case (name, fn) =>
      val before = shuffleW.get
      val t0 = System.nanoTime()
      val timed =
        try {
          fn(spark, sfDir).count()
          name -> (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: $e")
            e.printStackTrace()
            failed += name
            name -> -1.0
        }
      org.apache.spark.sql.GraftBridge.drainListeners(spark.sparkContext)
      shuffle(name) = shuffleW.get - before
      timed
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val sh = shuffle.map { case (k, v) =>
      s"\"" + k + "\":" + v / 1048576.0
    }.mkString("{", ",", "}")
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    // the driver's stdout capture has repeatedly truncated the big line
    // mid-JSON (losing the totals); print a short, self-contained summary
    // line FIRST so any prefix capture contains a parseable record, then
    // the full per-query line the contract asks for
    val summary =
      s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"spill_mb_total":${(spillB.get - spillBase) / 1048576.0},"errors":$errs,"sf":"$sfDir"}"""
    println(summary)
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"shuffle_mb":$sh,"spill_mb_total":${(spillB.get - spillBase) / 1048576.0},"errors":$errs,"sf":"$sfDir"}"""
    println(json)
    // ...and print the short summary LAST too: the driver's capture is a
    // TAIL, so whatever it keeps must END with a complete JSON record —
    // round 6's tail still cut the big line's head off (parsed: null)
    println(summary)
    // also persist to a file: the driver's stdout capture has truncated
    // mid-line before, losing the totals — the file copy is authoritative
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LAST.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable => System.err.println(s"[bench] could not write $out: $e") }
    if (failed.nonEmpty)
      System.err.println(s"[bench] ${failed.size} queries FAILED: ${failed.mkString(", ")}")
    spark.stop()
  }
}
