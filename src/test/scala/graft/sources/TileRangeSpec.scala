package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.tiles.TileFunctions

class TileRangeSpec extends SparkTestBase {

  private def grid(opts: (String, String)*) = {
    val r = spark.read.format("tilerange")
    opts.foldLeft(r) { case (rd, (k, v)) => rd.option(k, v) }.load()
  }

  private val world12 = Seq("minX" -> "0", "maxX" -> "4095",
    "minY" -> "0", "maxY" -> "4095", "zoom" -> "12")

  test("generates exactly the configured bbox, values match TileFunctions") {
    val df = grid("minX" -> "10", "maxX" -> "19", "minY" -> "5", "maxY" -> "8",
      "zoom" -> "12", "partitions" -> "4")
    assert(df.count() == 10 * 4)
    val bad = df
      .withColumn("lon2", TileFunctions.colToLon(col("x"), 12))
      .withColumn("lat2", TileFunctions.rowToLat(col("y"), 12))
      .filter(round(col("lon"), 6) =!= col("lon2") || round(col("lat"), 6) =!= col("lat2"))
    assert(bad.count() == 0)
    // partition split covers the x range without overlap
    assert(df.select("x").distinct().count() == 10)
  }

  test("x/y range filters push into generation (plan shows tightened bounds)") {
    val df = grid(world12: _*)
      .filter(col("x") >= 2048 && col("x") <= 2057 && col("y") === 1300)
    assert(df.count() == 10)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("2048<=x<=2057"), plan.take(1500))
    assert(plan.contains("1300<=y<=1300"), plan.take(1500))
    // consumed filters must NOT be re-evaluated as a Filter node
    assert(!plan.contains("Filter "), plan.take(1500))
  }

  test("column pruning reaches the reader (lon/lat not generated for x,y scans)") {
    val df = grid("minX" -> "0", "maxX" -> "99", "minY" -> "0", "maxY" -> "0",
      "zoom" -> "12").select("x", "y")
    assert(df.queryExecution.executedPlan.toString.contains("cols=[x,y]"))
    assert(df.agg(sum("x")).head.getLong(0) == (0L to 99L).sum)
  }

  test("COUNT/MIN/MAX push down as closed-form answers (no row generation)") {
    // zoom 30 world: 2^60 ≈ 1.15e18 tiles — any per-row path would never finish
    val n = (1L << 30) - 1
    val df = grid("minX" -> "0", "maxX" -> n.toString, "minY" -> "0",
      "maxY" -> n.toString, "zoom" -> "30")
      .filter(col("x").between(5, 1000004) && col("y").between(10, 2000009))
    val agg = df.agg(count(lit(1)).as("n"), min("x").as("mnx"), max("x").as("mxx"),
      min("y").as("mny"), max("y").as("mxy"))
    val r = agg.head
    assert(r.getAs[Long]("n") == 1000000L * 2000000L)
    assert(r.getAs[Long]("mnx") == 5 && r.getAs[Long]("mxx") == 1000004)
    assert(r.getAs[Long]("mny") == 10 && r.getAs[Long]("mxy") == 2000009)
    assert(agg.queryExecution.executedPlan.toString.contains("CLOSED-FORM"))
  }

  test("options are case-insensitive and Long-extreme filters return empty, not the world") {
    val lower = grid("minx" -> "0", "maxx" -> "9", "miny" -> "0", "maxy" -> "0",
      "zoom" -> "12")
    assert(lower.count() == 10)
    // consumed-but-unapplied would return all rows here; saturating
    // bounds must make these provably empty instead
    assert(lower.filter(col("x") > Long.MaxValue).count() == 0)
    assert(lower.filter(col("x") < Long.MinValue).count() == 0)
  }

  test("a z21 world-scale table plans without generating anything") {
    val n = (1L << 21) - 1
    val df = grid("minX" -> "0", "maxX" -> n.toString, "minY" -> "0",
      "maxY" -> n.toString, "zoom" -> "21")
      .filter(col("x").between(1000000, 1000001) && col("y").between(2000, 2001))
    // 4.4e12-tile table; only the 4 filtered rows are ever produced
    assert(df.count() == 4)
  }
}
