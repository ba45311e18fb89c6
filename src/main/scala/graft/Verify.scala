package graft

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Failure-proof by construction (round 7's CORRECTNESS came back `{}`
  * because the sweep outgrew the driver's budget and died with nothing
  * on disk):
  *
  *  - `oracle_sql.json` is written FIRST — it is static metadata, so a
  *    sweep killed at any later point still leaves a valid partial
  *    artifact (every completed dump + the oracle map) instead of
  *    nothing.
  *  - Each query's parquet dir lands as it completes; `kill -9`
  *    mid-sweep loses at most the in-flight queries.
  *  - `SPARK_GRAFT_VERIFY_BUDGET` (seconds, optional): once exceeded,
  *    no NEW query starts; in-flight ones finish and the JVM exits
  *    cleanly with everything-so-far on disk.
  *  - The sweep runs `SPARK_GRAFT_VERIFY_PAR` (default 8) queries
  *    concurrently. Spark's scheduler is designed for concurrent job
  *    submission; each worker thread gets its own `spark.newSession()`
  *    (shared SparkContext + injected extensions, but isolated SQLConf,
  *    temp views, and memory-sink catalog) so the streaming replays'
  *    shuffle-partition override and b36's temp view cannot race across
  *    threads. At sf0.01 the sweep is dominated by fixed per-query cost
  *    (planning, micro-batch setup, a single-file parquet write), which
  *    parallelizes near-linearly.
  *  - Known-heavy keys are dispatched first (LPT scheduling): with 8
  *    workers the long poles overlap the cheap tail instead of
  *    straggling after it, and under a tight budget the expensive
  *    queries — the ones most worth attesting — are attempted first.
  */
object Verify {

  /** Longest-first dispatch order: keys that dominate the sweep wall
    * time (measured at sf0.01: streaming replays pay ~2-4 s of
    * micro-batch setup each; c59/c85/c19/c88 are the heavy batch ops).
    * Everything else runs after these, in name order.
    */
  private val heavyFirst = Seq(
    "c96_bpe_segment", "c59_bpe_merges", "c85_threshold_sweep", "c19_dedup_collapse",
    "c57_ppl_buckets", "c88_bm25", "c60_lsh_curve", "c6_minhash_lsh",
    "c93_cross_lingual", "a25_clustered_challenge", "a25_ring_stats",
    "a25_geojson_fp", "c80_quality_dup", "c51_semdedup",
  ) ++ SparkEntry.queries.keys.filter(_.startsWith("d")).toSeq.sorted

  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query names; a trailing `*`
    // makes an entry a prefix match (`d*` = the whole D block — how
    // tools/fuzz.sh selects the split-fuzz lane without hardcoding 41
    // key names). The driver always runs the full surface with two args.
    val (sfDir, outDir, keep) = args match {
      case Array(s, o) => (s, o, (_: String) => true)
      case Array(s, o, names) =>
        val (globs, exact) = names.split(',').partition(_.endsWith("*"))
        val set = exact.toSet
        val prefixes = globs.map(_.dropRight(1)).toSeq
        (s, o, (n: String) => set.contains(n) || prefixes.exists(n.startsWith))
    }
    val spark = GraftSession.local()
    new java.io.File(outDir).mkdirs()
    // static metadata first — see scaladoc
    OracleJson.write(outDir, keep)

    val budgetNanos = sys.env.get("SPARK_GRAFT_VERIFY_BUDGET")
      .map(_.trim.toLong * 1000000000L).getOrElse(Long.MaxValue)
    val t0 = System.nanoTime()
    val par = sys.env.get("SPARK_GRAFT_VERIFY_PAR").map(_.trim.toInt).getOrElse(8)

    val all = SparkEntry.queries.filter(kv => keep(kv._1))
    val rank = heavyFirst.zipWithIndex.toMap
    val ordered = all.toSeq.sortBy { case (n, _) =>
      (rank.getOrElse(n, Int.MaxValue), n)
    }
    val queue = new ConcurrentLinkedQueue[(String, (SparkSession, String) => DataFrame)]
    ordered.foreach(queue.add(_): Unit)
    val done = new AtomicInteger
    val failed = new ConcurrentLinkedQueue[String]
    val skipped = new AtomicInteger

    def worker(): Thread = new Thread(() => {
      val session = spark.newSession()
      var kv = queue.poll()
      while (kv != null) {
        val (name, fn) = kv
        if (System.nanoTime() - t0 > budgetNanos) {
          skipped.incrementAndGet(): Unit
        } else {
          val q0 = System.nanoTime()
          try {
            // dump to a dot-prefixed temp dir, then rename: a kill -9
            // mid-write leaves only an invisible temp, never a torn
            // parquet dir that breaks the driver's whole compare
            val tmp = s"$outDir/.tmp_$name"
            fn(session, sfDir).coalesce(1).write.mode("overwrite").parquet(tmp)
            val dst = java.nio.file.Paths.get(s"$outDir/$name")
            if (java.nio.file.Files.exists(dst)) {
              def rm(f: java.io.File): Unit = {
                Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
              }
              rm(dst.toFile)
            }
            java.nio.file.Files.move(java.nio.file.Paths.get(tmp), dst)
            val dt = (System.nanoTime() - q0) / 1e9
            System.err.println(
              f"[verify] $name%-28s ${dt}%7.2fs (${done.incrementAndGet()}/${ordered.size})")
          } catch { case e: Throwable =>
            failed.add(name): Unit
            // the first graft frames (walking causes) locate the failure
            // without dumping Spark's full scheduler stack
            val frames = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
              .flatMap(_.getStackTrace.filter(_.getClassName.startsWith("graft")).take(3))
              .take(6).map(f => s"    at $f").mkString("\n")
            System.err.println(s"[verify] $name FAILED: ${e.getMessage}\n$frames")
          }
        }
        kv = queue.poll()
      }
    })

    val threads = (1 to math.max(1, par)).map(_ => worker())
    threads.foreach(_.start())
    threads.foreach(_.join())

    val wall = (System.nanoTime() - t0) / 1e9
    System.err.println(
      f"[verify] done: ${done.get}/${ordered.size} dumped, " +
        f"${failed.size} failed, ${skipped.get} over-budget, ${wall}%.1fs wall")
    if (!failed.isEmpty)
      System.err.println(s"[verify] FAILED: ${java.util.List.copyOf(failed)}")
    spark.stop()
  }
}
