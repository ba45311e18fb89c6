package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class GeoJsonSpec extends SparkTestBase {

  private val sample =
    """{"type": "FeatureCollection", "features": [
      |  {"type": "Feature", "properties": {"name": "alpha"},
      |   "geometry": {"type": "Polygon",
      |     "coordinates": [[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0], [0.0, 0.0]]]}},
      |  {"type": "Feature", "properties": {"name": "beta"},
      |   "geometry": {"type": "Polygon",
      |     "coordinates": [[[10.0, 10.0], [12.0, 10.0], [11.0, 12.0], [10.0, 10.0]]]}}
      |]}""".stripMargin

  private def withSample(f: String => Unit): Unit = {
    val dir = Files.createTempDirectory("graft-geojson")
    val p = dir.resolve("polys.geojson")
    Files.writeString(p, sample)
    f(p.toString)
  }

  test("readPolygons: one row per feature, outer ring preserved in order") {
    withSample { path =>
      val rows = GeoJson.readPolygons(spark, path).orderBy("feature_id").collect()
      assert(rows.length == 2)
      assert(rows(0).getMap[String, String](1)("name") == "alpha")
      val ring = GeoJson.readPolygonVertices(spark, path)
        .filter(col("feature_id") === 0).orderBy("vertex_idx")
        .select("lon", "lat").collect().map(r => (r.getDouble(0), r.getDouble(1)))
      assert(ring.head == ((0.0, 0.0)) && ring(1) == ((1.0, 0.0)) && ring.length == 5)
    }
  }

  private val multiSample =
    """{"type": "FeatureCollection", "features": [
      |  {"type": "Feature", "properties": {"name": "donut"},
      |   "geometry": {"type": "Polygon",
      |     "coordinates": [
      |       [[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0], [0.0, 0.0]],
      |       [[4.0, 4.0], [6.0, 4.0], [6.0, 6.0], [4.0, 6.0], [4.0, 4.0]]]}},
      |  {"type": "Feature", "properties": {"name": "isles"},
      |   "geometry": {"type": "MultiPolygon",
      |     "coordinates": [
      |       [[[20.0, 20.0], [21.0, 20.0], [21.0, 21.0], [20.0, 20.0]]],
      |       [[[30.0, 30.0], [31.0, 30.0], [31.0, 31.0], [30.0, 30.0]],
      |        [[30.2, 30.2], [30.4, 30.2], [30.3, 30.4], [30.2, 30.2]]]]}}
      |]}""".stripMargin

  test("readPolygonRings: MultiPolygon features and interior rings (holes)") {
    val dir = Files.createTempDirectory("graft-geojson-multi")
    val p = dir.resolve("multi.geojson")
    Files.writeString(p, multiSample)
    val rings = GeoJson.readPolygonRings(spark, p.toString)
    // donut: 1 polygon, outer + 1 hole (2 rings); isles: 2 polygons,
    // second holed (1 + 2 rings)
    assert(rings.count() == 5)
    val donut = rings.filter(col("feature_id") === 0).orderBy("polygon_idx", "ring_idx").collect()
    assert(donut.length == 2)
    assert(!donut(0).getBoolean(5) && donut(1).getBoolean(5)) // is_hole
    val isles = rings.filter(col("feature_id") === 1)
    assert(isles.select("polygon_idx").distinct().count() == 2)
    assert(isles.filter(col("is_hole")).count() == 1)
    // the back-compat view still returns one outer ring per feature,
    // for MultiPolygon the first polygon's outer boundary
    val flat = GeoJson.readPolygons(spark, p.toString).orderBy("feature_id").collect()
    assert(flat.length == 2)
    assert(flat(1).getSeq[org.apache.spark.sql.Row](2).head.getDouble(0) == 20.0)
  }

  test("a supported geometry with unparseable coordinates fails loudly, not silently") {
    val dir = Files.createTempDirectory("graft-geojson-bad")
    val p = dir.resolve("bad.geojson")
    Files.writeString(p,
      """{"type": "FeatureCollection", "features": [
        |  {"type": "Feature", "properties": {"name": "broken"},
        |   "geometry": {"type": "Polygon", "coordinates": "not-an-array"}}
        |]}""".stripMargin)
    val e = intercept[Exception] {
      GeoJson.readPolygonRings(spark, p.toString).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("unparseable GeoJSON coordinates")))
  }

  test("writeChallengeLines emits one GeoJSON document per line") {
    val out = Files.createTempDirectory("graft-mr").resolve("challenge").toString
    val df = graft.tiles.GeoQueries.a14TileGeojson(spark, sf).select("geojson").limit(20)
    GeoJson.writeChallengeLines(df, out)
    val lines = spark.read.text(out)
    assert(lines.count() == 20)
    assert(lines.filter(!col("value").startsWith("{\"type\": \"FeatureCollection\"")).count() == 0)
  }
}
