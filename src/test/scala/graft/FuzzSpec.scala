package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSession

/** CI half of the differential fuzz loop (the other half is
  * `tools/fuzz.sh`, which adds the DuckDB oracle compare — DuckDB is not
  * on the sbt test classpath, so CI pins crash-freedom only).
  *
  * For seeds 0 (single-row corpus: every table exactly one row) and 1
  * (adversarial domains: NULL/empty/unicode texts, duplicate classes,
  * tied sort keys, dangling FKs, zero vectors), every key in
  * `SparkEntry.queries` must evaluate without throwing. Round 14's four
  * fuzz finds (zero-norm cosine, NULL-text pack fold, NULL band keys,
  * empty-text segmenter descent) were all crashes or NULL-domain
  * divergence on exactly these corpora.
  */
class FuzzSpec extends SparkTestBase {

  /** Run every query on a seed's corpus with a small worker pool (each
    * worker gets its own `newSession()` — same isolation contract as
    * Verify's sweep) and return the keys that threw, with messages.
    */
  private def sweep(seed: Long): Seq[String] = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-fuzz-s$seed").toString
    Fuzz.writeCorpus(spark, dir, seed)
    val queue = new ConcurrentLinkedQueue[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach(queue.add(_): Unit)
    val failed = new ConcurrentLinkedQueue[String]
    val threads = (1 to 8).map { _ =>
      new Thread(() => {
        val session = spark.newSession()
        var kv = queue.poll()
        while (kv != null) {
          try kv._2(session, dir).collect(): Unit
          catch {
            case e: Throwable =>
              failed.add(s"${kv._1}: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(200)}"): Unit
          }
          kv = queue.poll()
        }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    failed.asScala.toSeq.sorted
  }

  test("fuzz seed 0 (single-row corpus): every query evaluates") {
    val failures = sweep(0L)
    assert(failures.isEmpty, s"\n${failures.mkString("\n")}")
  }

  test("fuzz seed 1 (adversarial domains): every query evaluates") {
    val failures = sweep(1L)
    assert(failures.isEmpty, s"\n${failures.mkString("\n")}")
  }
}
