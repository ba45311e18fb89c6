package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** GeoJSON source/sink (SURVEY.md §2 E): the reference consumes city
  * polygons from GeoJSON (process_city_shapes.py geoJSON.zip model, where
  * `shapely.shape` yields Polygons AND MultiPolygons — many real cities
  * are archipelagos or have enclave holes) and emits line-delimited
  * MapRoulette challenge GeoJSON (maproulette.py:12).
  *
  * Reader: FeatureCollection of Polygon/MultiPolygon features. The
  * geometry `coordinates` nesting depth differs per type (3 levels for
  * Polygon, 4 for MultiPolygon), so one fixed array schema can't hold
  * both; instead `coordinates` is captured as a RAW JSON string (Spark's
  * JSON reader copies the token structure verbatim into StringType
  * fields) and parsed per-type with `from_json` — all column-level,
  * codegen-friendly, no UDF, schema still pinned (no inference pass over
  * a huge file).
  */
object GeoJson {

  /** Pinned schema for a FeatureCollection; `coordinates` raw (see class
    * doc) so Polygon and MultiPolygon coexist.
    */
  val polygonSchema: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("features", ArrayType(StructType(Seq(
      StructField("type", StringType),
      StructField("properties", MapType(StringType, StringType)),
      StructField("geometry", StructType(Seq(
        StructField("type", StringType),
        StructField("coordinates", StringType))))))))))

  /** Polygon coordinates: ring → vertex → [lon, lat]. */
  private val polyCoordsType: DataType = DataType.fromDDL("array<array<array<double>>>")
  /** MultiPolygon coordinates: polygon → ring → vertex → [lon, lat]. */
  private val multiCoordsType: DataType = DataType.fromDDL("array<array<array<array<double>>>>")

  private def lonLat(v: Column): Column =
    struct(element_at(v, 1).as("lon"), element_at(v, 2).as("lat"))

  /** Full ring-level view: one row per ring of every polygon of every
    * feature — (feature_id, properties, geom_type, polygon_idx, ring_idx,
    * is_hole, ring). Ring 0 is the outer boundary, rings ≥ 1 are holes
    * (GeoJSON RFC 7946 §3.1.6); a Polygon is read as a one-polygon
    * MultiPolygon. Features with other geometry types yield no rows.
    */
  def readPolygonRings(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(polygonSchema).option("multiLine", value = true).json(path)
      .select(posexplode(col("features")).as(Seq("feature_id", "f")))
      .select(col("feature_id"), col("f.properties").as("properties"),
        col("f.geometry.type").as("geom_type"),
        col("f.geometry.coordinates").as("raw_coords"),
        from_json(col("f.geometry.coordinates"), polyCoordsType).as("pc"),
        from_json(col("f.geometry.coordinates"), multiCoordsType).as("mc"))
      // parse FIRST, wrap after: array(from_json(...)) would turn a
      // Polygon parse failure into the non-null [NULL], hiding it
      .withColumn("polys",
        when(col("geom_type") === "Polygon" && col("pc").isNotNull, array(col("pc")))
          .when(col("geom_type") === "MultiPolygon", col("mc")))
      // fail loudly (the pinned-schema contract): a SUPPORTED geometry
      // type whose coordinates string doesn't parse must not silently
      // drop the feature — a vanished city boundary has no other signal.
      // Unsupported types (Point, GeometryCollection, …) still yield no
      // rows, as documented.
      .withColumn("polys",
        when(col("geom_type").isin("Polygon", "MultiPolygon")
            && col("raw_coords").isNotNull
            && (col("polys").isNull || exists(col("polys"), p => p.isNull)),
          raise_error(concat(lit("unparseable GeoJSON coordinates for feature "),
            col("feature_id").cast("string"), lit(" (type "), col("geom_type"), lit(")"))))
          .otherwise(col("polys")))
      .select(col("feature_id"), col("properties"), col("geom_type"),
        posexplode(col("polys")).as(Seq("polygon_idx", "rings")))
      .select(col("feature_id"), col("properties"), col("geom_type"), col("polygon_idx"),
        posexplode(col("rings")).as(Seq("ring_idx", "raw_ring")))
      .select(col("feature_id"), col("properties"), col("geom_type"),
        col("polygon_idx"), col("ring_idx"), (col("ring_idx") > 0).as("is_hole"),
        transform(col("raw_ring"), lonLat _).as("ring"))

  /** Back-compat single-ring view: (feature_id, properties, ring) — the
    * outer ring of each feature's first polygon, the shape the convex
    * search-polygon pipeline consumes (hull → simplify → buffer flattens
    * holes anyway, process_city_shapes.py:93-104).
    */
  def readPolygons(spark: SparkSession, path: String): DataFrame =
    readPolygonRings(spark, path)
      .filter(col("polygon_idx") === 0 && col("ring_idx") === 0)
      .select(col("feature_id"), col("properties"), col("ring"))

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
