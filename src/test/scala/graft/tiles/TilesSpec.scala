package graft.tiles

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class TileFunctionsSpec extends SparkTestBase {
  import TileFunctions._

  test("deg2num known values (reference process_city_shapes.py:18)") {
    val df = spark.range(1).select(
      lonToCol(lit(0.0), 1).as("cx"), latToRow(lit(0.0), 1).as("cy"),
      lonToCol(lit(-180.0), 1).as("wx"), latToRow(lit(85.0), 1).as("ny"))
    val r = df.head
    assert(r.getLong(0) == 1) // lon 0 -> east half
    assert(r.getLong(1) == 1) // equator -> south row (rows count from north)
    assert(r.getLong(2) == 0)
    assert(r.getLong(3) == 0)
  }

  test("num2deg(deg2num) roundtrip stays within one tile") {
    val df = spark.range(100).select(
      (lit(-180.0) + col("id") * 3.57).as("lon"),
      (lit(-80.0) + col("id") * 1.59).as("lat"))
      .select(col("lon"), col("lat"),
        colToLon(lonToCol(col("lon"))).as("lon2"),
        rowToLat(latToRow(col("lat"))).as("lat2"))
    val bad = df.filter(
      abs(col("lon") - col("lon2")) > lit(360.0 / (1 << 21) * 1.01)
        || abs(col("lat") - col("lat2")) > lit(0.001)).count()
    assert(bad == 0)
  }
}

class ClusteringSpec extends SparkTestBase {

  test("4-adjacency components: two clusters, min-label ids") {
    import spark.implicits._
    val cells = Seq((0L, 0L), (0L, 1L), (1L, 1L), (5L, 5L)).toDF("x", "y")
    val got = Clustering.connectedComponents4(cells)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got((0L, 0L)) == 0L)
    assert(got((0L, 1L)) == 0L)
    assert(got((1L, 1L)) == 0L)
    assert(got((5L, 5L)) == 5L * Clustering.IdShift + 5L)
  }

  test("label encoding clears 32 bits: no collision at real z21 coordinates") {
    import spark.implicits._
    // with the old x*100000+y encoding, (0, 200000) and (2, 0) collided
    // (0*100000+200000 == 2*100000+0) — two far-apart cells would merge
    val cells = Seq((0L, 200000L), (2L, 0L), (2097151L, 2097151L)).toDF("x", "y")
    val got = Clustering.connectedComponents4(cells)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.values.toSet.size == 3) // all three isolated cells distinct
    assert(got((0L, 200000L)) == 200000L)
    assert(got((2L, 0L)) == 2L * Clustering.IdShift)
    assert(got((2097151L, 2097151L)) == 2097151L * Clustering.IdShift + 2097151L)
  }

  test("diagonal tiles are NOT connected (4-neighbor, run_inference.py:21)") {
    import spark.implicits._
    val cells = Seq((0L, 0L), (1L, 1L)).toDF("x", "y")
    val ids = Clustering.connectedComponents4(cells)
      .select("cluster_id").distinct().count()
    assert(ids == 2)
  }

  test("edge cases: empty and single-cell inputs") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("x", "y")
    assert(Clustering.connectedComponents4(empty).count() == 0)
    assert(GridOps.dilate3x3(empty).count() == 0)
    val one = Seq((7L, 7L)).toDF("x", "y")
    val cc1 = Clustering.connectedComponents4(one).collect()
    assert(cc1.length == 1 && cc1.head.getLong(2) == 7L * Clustering.IdShift + 7L)
    assert(GridOps.dilate3x3(one).count() == 9)
  }
}

class GeoQueriesSpec extends SparkTestBase {

  test("a9 dilation is a superset of positives; a10 is disjoint from dilation") {
    val pos = GeoDerive.positives(spark, sf).select("x", "y")
    val dil = GridOps.dilate3x3(pos)
    assert(pos.join(dil, Seq("x", "y"), "left_anti").count() == 0)
    val cleanup = GeoQueries.a10ImageryCleanup(spark, sf)
    assert(cleanup.join(dil, Seq("x", "y"), "inner").count() == 0)
  }

  test("a15 outline edge count is even and bounds each cluster") {
    val outline = GeoQueries.a15ClusterOutline(spark, sf)
    // every rectilinear closed boundary has an even number of unit edges
    val odd = outline.groupBy("cluster_id").count()
      .filter(col("count") % 2 =!= 0).count()
    assert(odd == 0)
  }

  test("a3 grid fill stays inside each polygon bbox") {
    val g = GridOps.fillPolygons(spark)
    val p = Polygons.df(spark).select("poly", "minx", "maxx", "miny", "maxy")
    val out = g.join(p, "poly")
      .filter(col("x") < col("minx") || col("x") > col("maxx")
        || col("y") < col("miny") || col("y") > col("maxy")).count()
    assert(out == 0)
  }

  test("a17 upsert keeps exactly one row per (x, y), first source wins") {
    val up = GeoQueries.a17UpsertIgnore(spark, sf)
    assert(up.groupBy("x", "y").count().filter(col("count") > 1).count() == 0)
    // every cell from batch 1 must surface with src=1
    val b1 = GeoDerive.cells(spark, sf).select("x", "y")
    assert(up.filter(col("src") === 1).join(b1, Seq("x", "y"), "left_anti").count() == 0)
  }
}
