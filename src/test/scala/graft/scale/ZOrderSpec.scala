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

  /** Plain-Scala xy2d reference (the classic bit walk, nonnegative
    * div/mod form — the same recurrence hilbertD folds and the a33
    * oracle iterates).
    */
  private def xy2dRef(bits: Int, x0: Long, y0: Long): Long = {
    var (x, y, d) = (x0, y0, 0L)
    var s = (1L << bits) / 2
    while (s > 0) {
      val rx = x / s; val ry = y / s
      d += s * s * ((3 * rx) ^ ry)
      x %= s; y %= s
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  test("hilbertD is bijective with unit-step adjacency on a full 64×64 grid") {
    val bits = 6
    val n = 1 << bits
    val grid = spark.range(n.toLong * n).select(
      (col("id") / n).cast("long").as("x"), (col("id") % n).as("y"))
    val keyed = grid.select(col("x"), col("y"),
        ZOrder.hilbertD(col("x"), col("y"), bits).as("h"))
      .collect().map(r => (r.getLong(2), (r.getLong(0), r.getLong(1)))).toMap
    // bijective onto [0, n²)
    assert(keyed.size == n * n)
    assert(keyed.keys.min == 0L && keyed.keys.max == n.toLong * n - 1)
    // THE Hilbert property (what Morton lacks): consecutive keys are
    // always grid neighbors — any botched reflection/swap breaks this
    (1 until n * n).foreach { d =>
      val (x1, y1) = keyed(d - 1L); val (x2, y2) = keyed(d.toLong)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"keys ${d - 1}→$d jump from ($x1,$y1) to ($x2,$y2)")
    }
  }

  test("hilbert key ranges cover tighter rectangles than morton (the a33/writeHilbert claim)") {
    // The file-layout claim, measured deterministically without file
    // I/O: cut each curve's key space into 24 equal-count contiguous
    // ranges (what repartitionByRange does to a write) and compare the
    // total bounding-rectangle area per range. 24 is deliberately NOT a
    // power of two: at aligned power-of-two cuts both curves give
    // perfect squares — misaligned cuts are where Morton's quadrant
    // jumps blow the rectangle up and Hilbert's unit steps don't.
    val bits = 9
    val n = 1 << bits
    val grid = spark.range(n.toLong * n).select(
      (col("id") / n).cast("long").as("x"), (col("id") % n).as("y"))
    def totalArea(key: org.apache.spark.sql.Column): Long = {
      val w = org.apache.spark.sql.expressions.Window.orderBy("k")
      grid.select(col("x"), col("y"), key.as("k"))
        .withColumn("b", ntile(24).over(w))
        .groupBy("b")
        .agg(((max("x") - min("x") + 1) * (max("y") - min("y") + 1)).as("area"))
        .agg(sum("area")).head().getLong(0)
    }
    val morton = totalArea(ZOrder.zValue(col("x"), col("y"), bits))
    val hilbert = totalArea(ZOrder.hilbertD(col("x"), col("y"), bits))
    assert(hilbert < morton,
      s"hilbert total range area $hilbert not tighter than morton $morton")
  }

  test("hilbertD matches the plain-Scala reference at bits=12") {
    val pts = spark.range(4096).select(
      (col("id") * 48271L % 4096L).as("x"), (col("id") * 16807L % 4096L).as("y"))
    val rows = pts.select(col("x"), col("y"),
      ZOrder.hilbertD(col("x"), col("y"), 12).as("h")).collect()
    rows.foreach { r =>
      assert(r.getLong(2) == xy2dRef(12, r.getLong(0), r.getLong(1)))
    }
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
