package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** GeoJSON source/sink (SURVEY.md §2 E): the reference consumes city
  * polygons from GeoJSON (process_city_shapes.py geoJSON.zip model) and
  * emits line-delimited MapRoulette challenge GeoJSON (maproulette.py:12).
  *
  * Reader: FeatureCollection of Polygons → one row per feature with the
  * outer ring exploded to (feature_id, vertex_idx, lon, lat) or kept as
  * an array column. Schema is pinned (no inference) so reads scale and
  * malformed docs fail loudly.
  */
object GeoJson {

  /** Pinned schema for a Polygon FeatureCollection. `coordinates` is
    * ring → vertex → [lon, lat].
    */
  val polygonSchema: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("features", ArrayType(StructType(Seq(
      StructField("type", StringType),
      StructField("properties", MapType(StringType, StringType)),
      StructField("geometry", StructType(Seq(
        StructField("type", StringType),
        StructField("coordinates", ArrayType(ArrayType(ArrayType(DoubleType)))))))))))))

  /** Read a (multiLine) GeoJSON FeatureCollection file into
    * (feature_id, properties, ring) — ring = outer ring as array of
    * (lon, lat) structs.
    */
  def readPolygons(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(polygonSchema).option("multiLine", value = true).json(path)
      .select(posexplode(col("features")).as(Seq("feature_id", "f")))
      .select(col("feature_id"), col("f.properties").as("properties"),
        transform(element_at(col("f.geometry.coordinates"), 1),
          v => struct(element_at(v, 1).as("lon"), element_at(v, 2).as("lat"))).as("ring"))

  /** Vertex-exploded view (feature_id, vertex_idx, lon, lat). */
  def readPolygonVertices(spark: SparkSession, path: String): DataFrame =
    readPolygons(spark, path)
      .select(col("feature_id"), posexplode(col("ring")).as(Seq("vertex_idx", "v")))
      .select(col("feature_id"), col("vertex_idx"), col("v.lon").as("lon"), col("v.lat").as("lat"))

  /** Write a one-GeoJSON-document-per-line column as text — the
    * MapRoulette challenge-file shape the reference uploads
    * (maproulette.py:12-14). Pass a DataFrame with exactly one string
    * column.
    */
  def writeChallengeLines(df: DataFrame, path: String): Unit = {
    require(df.schema.size == 1 && df.schema.head.dataType == StringType,
      s"expected a single string column, got ${df.schema.simpleString}")
    df.write.mode("overwrite").text(path)
  }
}
