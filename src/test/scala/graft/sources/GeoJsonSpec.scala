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

  test("writeChallengeLines emits one GeoJSON document per line") {
    val out = Files.createTempDirectory("graft-mr").resolve("challenge").toString
    val df = graft.tiles.GeoQueries.a14TileGeojson(spark, sf).select("geojson").limit(20)
    GeoJson.writeChallengeLines(df, out)
    val lines = spark.read.text(out)
    assert(lines.count() == 20)
    assert(lines.filter(!col("value").startsWith("{\"type\": \"FeatureCollection\"")).count() == 0)
  }
}
