package graft.scale

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  /** Sum of task input bytes for one action — the metric z-ordering is
    * supposed to shrink (row groups skipped via parquet min/max never
    * reach the read path).
    */
  private def bytesRead[T](f: => T): Long = {
    val bytes = new java.util.concurrent.atomic.AtomicLong(0L)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          bytes.addAndGet(te.taskMetrics.inputMetrics.bytesRead): Unit
    }
    spark.sparkContext.addSparkListener(l)
    try {
      f
      org.apache.spark.sql.GraftBridge.drainListeners(spark.sparkContext)
      bytes.get
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("zValue interleaves bits (known vectors + locality)") {
    val got = spark.range(1).select(
      ZOrder.zValue(lit(0L), lit(0L), 10).as("a"),
      ZOrder.zValue(lit(1L), lit(0L), 10).as("b"),
      ZOrder.zValue(lit(0L), lit(1L), 10).as("c"),
      ZOrder.zValue(lit(3L), lit(5L), 10).as("d"), // 011 ⋈ 101 = 100111 = 39
      ZOrder.zValue(lit(1023L), lit(1023L), 10).as("e")).head()
    assert(got.getLong(0) == 0L && got.getLong(1) == 1L && got.getLong(2) == 2L)
    assert(got.getLong(3) == 39L)
    assert(got.getLong(4) == (1L << 20) - 1)
  }

  test("z-ordered layout: a 0.1% bbox query reads a fraction of the bytes a scattered layout reads") {
    val n = 1000000L
    // deterministic pseudo-random scatter of points over a 1024×1024 grid
    // with a fat payload so data bytes dominate footers
    val pts = spark.range(n).select(
      (col("id") * 48271L % 1024L).as("x"),
      (col("id") * 16807L % 1024L).as("y"),
      concat(lit("payload-"), col("id"), lit("-"),
        md5(col("id").cast("string"))).as("payload"))
    val zDir = Files.createTempDirectory("zorder").toString
    val rDir = Files.createTempDirectory("scatter").toString
    ZOrder.writeZOrdered(pts, zDir, "x", "y", bits = 10, files = 16)
    pts.repartition(16).write.mode("overwrite").parquet(rDir) // scattered baseline
    def bbox(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("x").between(96, 127) && col("y").between(192, 223))
    val want = bbox(pts).count()
    val (zCnt, zBytes) = { var c = 0L; val b = bytesRead { c = bbox(spark.read.parquet(zDir)).count() }; (c, b) }
    val (rCnt, rBytes) = { var c = 0L; val b = bytesRead { c = bbox(spark.read.parquet(rDir)).count() }; (c, b) }
    assert(zCnt == want && rCnt == want) // layout never changes answers
    // the scattered layout's files all intersect the bbox in min/max
    // space → ~full scan; the z-ordered files' tight rectangles let all
    // but a couple of row groups be skipped from the footer alone
    assert(zBytes * 5 < rBytes,
      s"expected >5x read reduction, got z=$zBytes scattered=$rBytes")
  }
}
