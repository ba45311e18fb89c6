package graft.sources

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkTestBase

/** Property check of the tilerange connector: for random bboxes and
  * random pushed x/y range filters, the produced row set must equal the
  * closed-form intersection — count, per-axis extents, and coordinate
  * checksum. Runs a modest number of cases (each is a Spark job).
  */
class TileRangePropSpec extends SparkTestBase {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), p)
    assert(res.passed, res.status.toString)
  }

  private val boxGen: Gen[(Long, Long, Long, Long)] = for {
    minX <- Gen.chooseNum(0L, 4000L)
    w <- Gen.chooseNum(0L, 60L)
    minY <- Gen.chooseNum(0L, 4000L)
    h <- Gen.chooseNum(0L, 60L)
  } yield (minX, minX + w, minY, minY + h)

  test("random bbox × random pushed filter == closed-form row set") {
    check(Prop.forAll(boxGen, boxGen) { case ((ax0, ax1, ay0, ay1), (fx0, fx1, fy0, fy1)) =>
      val df = spark.read.format("tilerange")
        .option("minX", ax0).option("maxX", ax1)
        .option("minY", ay0).option("maxY", ay1)
        .option("zoom", 12).option("partitions", 3)
        .load()
        .filter(col("x") >= fx0 && col("x") <= fx1 && col("y") >= fy0 && col("y") <= fy1)
      val (x0, x1) = (math.max(ax0, fx0), math.min(ax1, fx1))
      val (y0, y1) = (math.max(ay0, fy0), math.min(ay1, fy1))
      val nx = math.max(0L, x1 - x0 + 1)
      val ny = math.max(0L, y1 - y0 + 1)
      val r = df.agg(count(lit(1)).as("n"), sum(col("x") + col("y")).as("cs")).head
      val wantCs =
        if (nx == 0 || ny == 0) null
        else java.lang.Long.valueOf((x0 + x1) * nx / 2 * ny + (y0 + y1) * ny / 2 * nx)
      r.getAs[Long]("n") == nx * ny && r.getAs[java.lang.Long]("cs") == wantCs
    })
  }
}
