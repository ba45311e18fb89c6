package graft.util

import org.apache.spark.sql.DataFrame

/** The ONE sealing primitive for frozen session stores (memoized
  * intermediates, snapshot stores, truth frames): truncate lineage and
  * materialize eagerly.
  *
  * Default = `localCheckpoint` (executor-local blocks: fast, no I/O
  * beyond the block manager) — right at test SF and on healthy
  * clusters. At 100 TB the big frozen stores pinned in executor
  * memory/disk are an OOM and a lost-executor recompute storm, not a
  * cache, so `graft.seal.durable=true` swaps EVERY seal site to a
  * reliable `checkpoint` (HDFS/object-store files; survives executor
  * loss, frees block-manager space). Same trade [[graft.dedup.GraphCC]]
  * offers its iteration frames via `graft.gcc.durable` and the RDD CC
  * loop via `graft.cc.durable` — this generalizes it to the sealed
  * STORES (SURVEY §6). Results must be conf-invariant (spec-pinned):
  * the hatch moves bytes, never values.
  *
  * `graft.seal.dir` (optional): checkpoint directory to install if the
  * context has none — a session conf so deployments need no code
  * change to flip the hatch on.
  */
object Seal {
  implicit final class Sealable(private val df: DataFrame) extends AnyVal {
    def seal(eager: Boolean = true): DataFrame = {
      val sess = df.sparkSession
      if (sess.conf.getOption("graft.seal.durable").contains("true")) {
        val sc = sess.sparkContext
        if (sc.getCheckpointDir.isEmpty)
          sess.conf.getOption("graft.seal.dir").foreach(sc.setCheckpointDir)
        df.checkpoint(eager)
      } else df.localCheckpoint(eager)
    }
  }
}
