package graft.util

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.util.Seal._

/** Pins the generalized durable-seal escape hatch (`graft.seal.durable`
  * + `graft.seal.dir`): every frozen-store seal site (the 80-odd
  * memoized intermediates, snapshot stores, and truth frames) defaults
  * to executor-local blocks but must swap to a reliable checkpoint
  * under the conf — at 100 TB a RAM/local-disk-pinned store is an OOM,
  * not a cache. Asserts (a) the conf actually redirects bytes to the
  * configured dir, (b) a real multi-seal query chain (the LSH
  * scored-pairs path: signature seal + candidate seal + rep seals)
  * returns IDENTICAL results either way — the hatch moves bytes, never
  * values — and (c) `graft.seal.dir` installs a checkpoint dir on a
  * context that has none, so flipping the hatch needs no code change.
  */
class SealSpec extends SparkTestBase {

  private def filesUnder(dir: java.io.File): Int = {
    def walk(f: java.io.File): Int =
      if (f.isDirectory) Option(f.listFiles).map(_.map(walk).sum).getOrElse(0)
      else 1
    walk(dir)
  }

  test("graft.seal.durable: seal() writes durable checkpoints, values unchanged") {
    val docs = spark.range(400).select(col("id").as("doc_id"),
      concat_ws(" ", expr(
        "transform(sequence(0, 9), k -> concat('w', ((id div 4) * (k + 3)) % 997))"))
        .as("text"))
    def run(): Seq[(Long, Long, Double)] =
      graft.dedup.DedupQueries.scoredRepPairsFor(docs, 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    val want = run()
    assert(want.nonEmpty, "degenerate fixture: no scored pairs at all")
    val dir = java.nio.file.Files.createTempDirectory("graft-seal").toFile
    // install the dir VIA THE CONF (not setCheckpointDir) to prove the
    // no-code-change path; clear any dir a prior suite installed
    val sc = spark.sparkContext
    sc.setCheckpointDir(null)
    spark.conf.set("graft.seal.durable", "true")
    spark.conf.set("graft.seal.dir", dir.toString)
    val got = try run()
      finally {
        spark.conf.unset("graft.seal.durable")
        spark.conf.unset("graft.seal.dir")
      }
    assert(got == want, "durable sealing changed the scored-pair results")
    assert(filesUnder(dir) > 0,
      "graft.seal.durable=true wrote nothing under graft.seal.dir — hatch ignored")
  }

  test("seal() default stays executor-local (no checkpoint files)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-seal-off").toFile
    spark.sparkContext.setCheckpointDir(dir.toString)
    val df = spark.range(100).select(col("id"), (col("id") * 7L).as("v")).seal()
    assert(df.count() == 100L)
    assert(filesUnder(dir) == 0,
      "default seal() wrote durable checkpoint files — the fast path regressed")
  }
}
