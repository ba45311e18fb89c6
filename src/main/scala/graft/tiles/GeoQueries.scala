package graft.tiles

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** SURVEY.md §2 block A: the reference's tile/geo pipeline as Spark
  * queries with DuckDB oracle twins. Every query reads the driver
  * testdata via the deterministic derivation in [[GeoDerive]].
  */
object GeoQueries {
  import GeoDerive.{Threshold => Th}
  import TileFunctions._

  private def withCtes(recursive: Boolean, ctes: String*)(body: String): String =
    (if (recursive) "WITH RECURSIVE " else "WITH ") + ctes.mkString(",\n") + "\n" + body

  /** Cell (0-based grid) → globally-plausible z21 tile coordinates. */
  private val TX = 600000L
  private val TY = 700000L

  // ---------------------------------------------------------------- A1
  /** deg2num over the lineitem-derived point cloud: pure column math, no
    * UDF — whole-stage codegen, pushdown-transparent.
    */
  def a1Deg2num(spark: SparkSession, dir: String): DataFrame =
    GeoDerive.points(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("lon"), col("lat"),
        lonToCol(col("lon")).as("tile_col"),
        latToRow(col("lat")).as("tile_row"))
      .orderBy("l_orderkey", "l_linenumber")

  val a1Sql: String = withCtes(false, GeoDerive.pointsCte)(
    s"""SELECT l_orderkey, l_linenumber, lon, lat,
       |  ${lonToColSql("lon")} AS tile_col,
       |  ${latToRowSql("lat")} AS tile_row
       |FROM points
       |ORDER BY l_orderkey, l_linenumber""".stripMargin)

  // ---------------------------------------------------------------- A2
  /** num2deg (tile center → lon/lat), reference process_city_shapes.py:38. */
  def a2Num2deg(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        (col("l_orderkey") % lit(2097152L)).as("tx"),
        ((col("l_partkey") * lit(104729L)) % lit(2097152L)).as("ty"))
      .withColumn("lon", colToLon(col("tx")))
      .withColumn("lat", rowToLat(col("ty")))
      .orderBy("l_orderkey", "l_linenumber")

  val a2Sql: String =
    s"""SELECT l_orderkey, l_linenumber,
       |  (l_orderkey % 2097152) AS tx,
       |  ((l_partkey * 104729) % 2097152) AS ty,
       |  ${colToLonSql("(l_orderkey % 2097152)")} AS lon,
       |  ${rowToLatSql("((l_partkey * 104729) % 2097152)")} AS lat
       |FROM lineitem
       |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------------- A3
  def a3GridFill(spark: SparkSession, dir: String): DataFrame =
    GridOps.fillPolygons(spark).orderBy("poly", "x", "y")

  val a3Sql: String = withCtes(false, Polygons.bboxCte, Polygons.edgesCte, Polygons.gridCte)(
    "SELECT poly, x, y FROM grid ORDER BY poly, x, y")

  // ---------------------------------------------------------------- A4
  def a4CentroidDistance(spark: SparkSession, dir: String): DataFrame =
    GridOps.centroidDistance(GeoDerive.cells(spark, dir), GridOps.centroids(spark))
      .select("poly", "x", "y", "score", "w", "centroid_distance")
      .orderBy("poly", "x", "y")

  private val a4Ctes = Seq(GeoDerive.cellsCte, Polygons.bboxCte, Polygons.edgesCte,
    Polygons.gridCte, Polygons.centroidsCte)

  val a4Sql: String = withCtes(false, a4Ctes: _*)(
    """SELECT c.poly, c.x, c.y, c.score, c.w,
      |  round(sqrt((c.x - t.cx) * (c.x - t.cx) + (c.y - t.cy) * (c.y - t.cy)), 6)
      |    AS centroid_distance
      |FROM cells c JOIN cent t USING (poly)
      |ORDER BY poly, x, y""".stripMargin)

  // ---------------------------------------------------------------- A5
  /** Center-outwards inference batch (solardb.py:215-221): global topK by
    * (poly, distance) → TakeOrderedAndProject, no full sort materialized.
    */
  def a5InferenceOrder(spark: SparkSession, dir: String): DataFrame =
    GridOps.centroidDistance(GeoDerive.cells(spark, dir), GridOps.centroids(spark))
      .select("poly", "x", "y", "centroid_distance")
      .orderBy(col("poly"), col("centroid_distance"), col("x"), col("y"))
      .limit(400)

  /** SQL twin of [[a5InferenceOrder]] — ONE definition, embedded by
    * a5/a18/a19/a21 so the oracles can't drift apart (outer queries
    * reference its columns by name).
    */
  private val inferenceBatchSql: String =
    """SELECT c.poly, c.x, c.y,
      |  round(sqrt((c.x - t.cx) * (c.x - t.cx) + (c.y - t.cy) * (c.y - t.cy)), 6)
      |    AS centroid_distance
      |FROM cells c JOIN cent t USING (poly)
      |ORDER BY poly, centroid_distance, x, y
      |LIMIT 400""".stripMargin

  val a5Sql: String = withCtes(false, a4Ctes: _*)(inferenceBatchSql)

  // ---------------------------------------------------------------- A6
  def a6ThresholdRank(spark: SparkSession, dir: String): DataFrame =
    GeoDerive.cells(spark, dir)
      .filter(col("score") >= 0.5)
      .select("x", "y", "score", "w")
      .orderBy(col("score").desc, col("x"), col("y"))

  val a6Sql: String = withCtes(false, GeoDerive.cellsCte)(
    """SELECT x, y, score, w FROM cells WHERE score >= 0.5
      |ORDER BY score DESC, x, y""".stripMargin)

  // ---------------------------------------------------------------- A7
  def a7GridCluster(spark: SparkSession, dir: String): DataFrame =
    Clustering.componentsFor(spark, dir)
      .orderBy("x", "y")

  val a7Sql: String = withCtes(true, GeoDerive.cellsCte, GeoDerive.positivesCte, Clustering.ccCte)(
    "SELECT x, y, cluster_id FROM cc ORDER BY x, y")

  // ---------------------------------------------------------------- A8
  /** Largest clusters + representative tile lon/lat
    * (solardb.py:262-280).
    */
  def a8LargestClusters(spark: SparkSession, dir: String): DataFrame =
    Clustering.componentsFor(spark, dir)
      .groupBy("cluster_id").agg(count(lit(1)).as("n_tiles"))
      .withColumn("rep_lon", colToLon(expr(s"cluster_id div ${Clustering.IdShift}") + lit(TX)))
      .withColumn("rep_lat", rowToLat((col("cluster_id") % Clustering.IdShift) + lit(TY)))
      .orderBy(col("n_tiles").desc, col("cluster_id"))
      .limit(10)

  val a8Sql: String = withCtes(true, GeoDerive.cellsCte, GeoDerive.positivesCte, Clustering.ccCte)(
    s"""SELECT cluster_id, COUNT(*) AS n_tiles,
       |  ${colToLonSql(s"(cluster_id // ${Clustering.IdShift} + $TX)")} AS rep_lon,
       |  ${rowToLatSql(s"(cluster_id % ${Clustering.IdShift} + $TY)")} AS rep_lat
       |FROM cc GROUP BY cluster_id
       |ORDER BY n_tiles DESC, cluster_id
       |LIMIT 10""".stripMargin)

  // ---------------------------------------------------------------- A9
  def a9Dilate(spark: SparkSession, dir: String): DataFrame =
    GridOps.dilate3x3(GeoDerive.positives(spark, dir)).orderBy("x", "y")

  val a9Sql: String = withCtes(false, GeoDerive.cellsCte, GeoDerive.positivesCte, GridOps.dilate3x3Cte)(
    "SELECT x, y FROM dil ORDER BY x, y")

  // ---------------------------------------------------------------- A10
  /** Imagery cleanup (run_inference.py:63-92): observed cells NOT inside
    * the dilated positive set — left-anti hash join, both sides already
    * partitioned on (x, y).
    */
  def a10ImageryCleanup(spark: SparkSession, dir: String): DataFrame = {
    val dil = GridOps.dilate3x3(GeoDerive.positives(spark, dir))
    GeoDerive.cells(spark, dir)
      .join(dil, Seq("x", "y"), "left_anti")
      .select("x", "y", "w")
      .orderBy("x", "y")
  }

  val a10Sql: String = withCtes(false, GeoDerive.cellsCte, GeoDerive.positivesCte, GridOps.dilate3x3Cte)(
    """SELECT c.x, c.y, c.w FROM cells c
      |WHERE NOT EXISTS (SELECT 1 FROM dil d WHERE d.x = c.x AND d.y = c.y)
      |ORDER BY x, y""".stripMargin)

  // ---------------------------------------------------------------- A11
  /** mark_has_imagery (solardb.py:139-162): 20×20 download blocks around
    * positives; meshgrid-fill tiles that were never observed
    * (existed=false ⇔ reference's "create new tile objects").
    */
  def a11MarkImagery(spark: SparkSession, dir: String): DataFrame = {
    val cells = GeoDerive.cells(spark, dir)
    val blocks = GeoDerive.positives(spark, dir)
      .select(GridOps.blockBase(col("x"), 20).as("bx"), GridOps.blockBase(col("y"), 20).as("by"))
      .distinct()
    blocks
      .withColumn("x", explode(sequence(col("bx"), col("bx") + 19)))
      .repartition(col("bx"), col("by"), col("x"))
      .withColumn("y", explode(sequence(col("by"), col("by") + 19)))
      .join(cells.select(col("x"), col("y"), lit(true).as("existed")), Seq("x", "y"), "left")
      .select(col("bx"), col("by"), col("x"), col("y"),
        coalesce(col("existed"), lit(false)).as("existed"))
      .orderBy("bx", "by", "x", "y")
  }

  /** Shared blocks/bg CTEs: the 20×20 imagery block grid around
    * positives — embedded by a11 and a21 from one definition.
    */
  private val imageryBlockCtes: String =
    """blocks AS (SELECT DISTINCT (x - x % 20) AS bx, (y - y % 20) AS by FROM pos),
      |bgx AS (SELECT bx, by, UNNEST(range(bx, bx + 20)) AS x FROM blocks),
      |bg AS (SELECT bx, by, x, UNNEST(range(by, by + 20)) AS y FROM bgx)""".stripMargin

  val a11Sql: String = withCtes(false, GeoDerive.cellsCte, GeoDerive.positivesCte,
    imageryBlockCtes)(
    """SELECT g.bx, g.by, g.x, g.y, (c.x IS NOT NULL) AS existed
      |FROM bg g LEFT JOIN cells c ON g.x = c.x AND g.y = c.y
      |ORDER BY g.bx, g.by, g.x, g.y""".stripMargin)

  // ---------------------------------------------------------------- A12
  def a12OsmDedup(spark: SparkSession, dir: String): DataFrame =
    GeoDerive.nodes(spark, dir)
      .select(round(col("lon"), 5).as("lon5"), round(col("lat"), 5).as("lat5"))
      .distinct()
      .orderBy("lon5", "lat5")

  val a12Sql: String = withCtes(false, GeoDerive.nodesCte)(
    """SELECT DISTINCT round(lon, 5) AS lon5, round(lat, 5) AS lat5
      |FROM nodes ORDER BY lon5, lat5""".stripMargin)

  // ---------------------------------------------------------------- A13
  /** Drop clusters containing an existing OSM node
    * (maproulette.py:69-83). The reference rtree-prefilters by bbox then
    * tests exact `polygon.contains(point)` on the cluster outline; for a
    * RECTILINEAR union of tile squares the exact test is purely
    * relational — a point is inside the union iff its deg2num tile is a
    * member tile — so the whole operator is one distinct + equi-join on
    * (x, y) + left-anti, with no θ-join, no geometry, and no prefilter
    * needed (the bbox rtree only existed to make shapely's point test
    * affordable; the equi-join already is). An L-shaped cluster whose
    * bbox covers a node that sits outside the tile union is correctly
    * KEPT — the bbox-only variant (rounds 1–5) wrongly dropped it.
    * Bbox-prefilter machinery lives on in
    * [[graft.scale.ScaleOps.boxAntiJoin]] for true box-containment asks.
    */
  /** The reusable core of a13: `cc` is the (x, y, cluster_id) membership,
    * `nodeTiles` the distinct node tile coordinates (x, y). Returns the
    * bbox summary of every cluster whose tile union contains NO node.
    */
  def exactSpatialAntiJoin(cc: DataFrame, nodeTiles: DataFrame): DataFrame = {
    val boxes = cc.groupBy("cluster_id")
      .agg(min("x").as("minx"), max("x").as("maxx"),
        min("y").as("miny"), max("y").as("maxy"), count(lit(1)).as("n_tiles"))
    val hit = cc.join(nodeTiles, Seq("x", "y"), "left_semi")
      .select("cluster_id").distinct()
    boxes.join(hit, Seq("cluster_id"), "left_anti")
  }

  def a13SpatialAntijoin(spark: SparkSession, dir: String): DataFrame = {
    val cc = Clustering.componentsFor(spark, dir)
    val nds = GeoDerive.nodes(spark, dir)
      .select(col("nx").as("x"), col("ny").as("y")).distinct()
    exactSpatialAntiJoin(cc, nds).orderBy("cluster_id")
  }

  val a13Sql: String = withCtes(true, GeoDerive.cellsCte, GeoDerive.positivesCte,
    Clustering.ccCte, GeoDerive.nodesCte,
    """boxes AS (
      |  SELECT cluster_id, MIN(x) AS minx, MAX(x) AS maxx,
      |         MIN(y) AS miny, MAX(y) AS maxy, COUNT(*) AS n_tiles
      |  FROM cc GROUP BY cluster_id
      |)""".stripMargin)(
    """SELECT b.* FROM boxes b
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM (SELECT DISTINCT nx, ny FROM nodes) n
      |  JOIN cc c ON c.x = n.nx AND c.y = n.ny
      |  WHERE c.cluster_id = b.cluster_id)
      |ORDER BY cluster_id""".stripMargin)

  // ---------------------------------------------------------------- A14
  /** Per-tile challenge GeoJSON line (maproulette.py:17-33): tile bbox
    * corners through num2deg, one formatted string per positive tile.
    */
  private val geojsonFmt =
    """{"type": "FeatureCollection", "features": [{"type": "Feature", "properties": {"prediction_confidence": %.3f}, "geometry": {"type": "Polygon", "coordinates": [[[%.6f, %.6f], [%.6f, %.6f], [%.6f, %.6f], [%.6f, %.6f], [%.6f, %.6f]]]}}]}"""

  def a14TileGeojson(spark: SparkSession, dir: String): DataFrame = {
    val p = GeoDerive.positives(spark, dir)
      .withColumn("tx", col("x") + lit(TX)).withColumn("ty", col("y") + lit(TY))
    def lon(c: Column) = colToLon(c, center = false)
    def lat(c: Column) = rowToLat(c, center = false)
    p.select(col("x"), col("y"),
        format_string(geojsonFmt,
          col("score"),
          lon(col("tx")), lat(col("ty")),
          lon(col("tx") + 1), lat(col("ty")),
          lon(col("tx") + 1), lat(col("ty") + 1),
          lon(col("tx")), lat(col("ty") + 1),
          lon(col("tx")), lat(col("ty"))).as("geojson"))
      .orderBy("x", "y")
  }

  val a14Sql: String = {
    def lon(c: String) = colToLonSql(c, center = false)
    def lat(c: String) = rowToLatSql(c, center = false)
    val tx = s"(x + $TX)"; val ty = s"(y + $TY)"
    val tx1 = s"(x + ${TX + 1})"; val ty1 = s"(y + ${TY + 1})"
    withCtes(false, GeoDerive.cellsCte, GeoDerive.positivesCte)(
      s"""SELECT x, y, printf('$geojsonFmt',
         |  score,
         |  ${lon(tx)}, ${lat(ty)},
         |  ${lon(tx1)}, ${lat(ty)},
         |  ${lon(tx1)}, ${lat(ty1)},
         |  ${lon(tx)}, ${lat(ty1)},
         |  ${lon(tx)}, ${lat(ty)}) AS geojson
         |FROM pos
         |ORDER BY x, y""".stripMargin)
  }

  // ---------------------------------------------------------------- A15
  /** Cluster outline = boundary edges of the rectilinear union of tile
    * squares (maproulette.py:36-66): every tile contributes 4 edges,
    * interior edges appear twice → keep count()=1.
    */
  def a15ClusterOutline(spark: SparkSession, dir: String): DataFrame = {
    val cc = Clustering.componentsFor(spark, dir)
    val edges = cc.select(col("cluster_id"), explode(array(
      struct(col("x").as("x1"), col("y").as("y1"), (col("x") + 1).as("x2"), col("y").as("y2")),
      struct(col("x").as("x1"), (col("y") + 1).as("y1"), (col("x") + 1).as("x2"), (col("y") + 1).as("y2")),
      struct(col("x").as("x1"), col("y").as("y1"), col("x").as("x2"), (col("y") + 1).as("y2")),
      struct((col("x") + 1).as("x1"), col("y").as("y1"), (col("x") + 1).as("x2"), (col("y") + 1).as("y2"))
    )).as("e"))
    edges.select(col("cluster_id"), col("e.x1"), col("e.y1"), col("e.x2"), col("e.y2"))
      .groupBy("cluster_id", "x1", "y1", "x2", "y2")
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") === 1)
      .drop("cnt")
      .orderBy("cluster_id", "x1", "y1", "x2", "y2")
  }

  val a15Sql: String = withCtes(true, GeoDerive.cellsCte, GeoDerive.positivesCte, Clustering.ccCte,
    """tedge AS (
      |  SELECT cluster_id, x AS x1, y AS y1, x + 1 AS x2, y AS y2 FROM cc
      |  UNION ALL
      |  SELECT cluster_id, x, y + 1, x + 1, y + 1 FROM cc
      |  UNION ALL
      |  SELECT cluster_id, x, y, x, y + 1 FROM cc
      |  UNION ALL
      |  SELECT cluster_id, x + 1, y, x + 1, y + 1 FROM cc
      |)""".stripMargin)(
    """SELECT cluster_id, x1, y1, x2, y2 FROM tedge
      |GROUP BY cluster_id, x1, y1, x2, y2
      |HAVING COUNT(*) = 1
      |ORDER BY cluster_id, x1, y1, x2, y2""".stripMargin)

  // ---------------------------------------------------------------- A16
  def a16PolygonArea(spark: SparkSession, dir: String): DataFrame =
    GridOps.fillPolygons(spark)
      .rollup("poly").agg(count(lit(1)).as("n_tiles"))
      .orderBy(col("poly").asc_nulls_first)

  val a16Sql: String = withCtes(false, Polygons.bboxCte, Polygons.edgesCte, Polygons.gridCte)(
    """SELECT poly, COUNT(*) AS n_tiles FROM grid
      |GROUP BY ROLLUP(poly)
      |ORDER BY poly ASC NULLS FIRST""".stripMargin)

  // ---------------------------------------------------------------- A17
  /** ON-CONFLICT-IGNORE upsert (solardb.py:51): first batch wins per PK. */
  def a17UpsertIgnore(spark: SparkSession, dir: String): DataFrame = {
    val b1 = GeoDerive.cells(spark, dir).select(col("x"), col("y"), col("score"), lit(1L).as("src"))
    val b2 = Tables.orders(spark, dir)
      .select((col("o_orderkey") % GeoDerive.W).as("x"), (col("o_custkey") % GeoDerive.H).as("y"),
        ((((col("o_orderkey") * 48271L) + (col("o_custkey") * 16807L)) % 1000) / lit(1000.0)).as("score"))
      .groupBy("x", "y").agg(max("score").as("score"))
      .select(col("x"), col("y"), col("score"), lit(2L).as("src"))
    b1.union(b2)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("x"), col("y")).orderBy(col("src"))))
      .filter(col("rn") === 1).drop("rn")
      .orderBy("x", "y")
  }

  val a17Sql: String = withCtes(false, GeoDerive.cellsCte,
    """b2 AS (
      |  SELECT (o_orderkey % 97) AS x, (o_custkey % 89) AS y,
      |         MAX((((o_orderkey * 48271) + (o_custkey * 16807)) % 1000) / 1000.0) AS score
      |  FROM ford GROUP BY 1, 2
      |),
      |unioned AS (
      |  SELECT x, y, score, 1 AS src FROM cells
      |  UNION ALL
      |  SELECT x, y, score, 2 AS src FROM b2
      |)""".stripMargin)(
    """SELECT x, y, score, CAST(src AS BIGINT) AS src FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY x, y ORDER BY src) AS rn FROM unioned
      |) WHERE rn = 1
      |ORDER BY x, y""".stripMargin)

  // ---------------------------------------------------------------- A18
  /** 3×3 stitch plan (imagery.py:113-139, stitch_image_at_coordinate):
    * per inference tile, the 9 source tiles with crop boxes and paste
    * offsets (STITCH_WIDTH=32 constants from the reference).
    */
  private val stitchConsts: Seq[(Int, Int, Int, Int, Int, Int, Int)] = Seq(
    // i, cx1, cy1, cx2, cy2, px, py  (i = (colOff+1)*3 + (rowOff+1))
    (0, 224, 224, 256, 256, 0, 0),
    (1, 224, 0, 256, 256, 0, 32),
    (2, 224, 0, 256, 32, 0, 288),
    (3, 0, 224, 256, 256, 32, 0),
    (4, 0, 0, 256, 256, 32, 32),
    (5, 0, 0, 256, 32, 32, 288),
    (6, 0, 224, 32, 256, 288, 0),
    (7, 0, 0, 32, 256, 288, 32),
    (8, 0, 0, 32, 32, 288, 288))

  def a18StitchPlan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val consts = stitchConsts.toDF("i", "cx1", "cy1", "cx2", "cy2", "px", "py")
      .select(col("i").cast("long"), col("cx1").cast("long"), col("cy1").cast("long"),
        col("cx2").cast("long"), col("cy2").cast("long"), col("px").cast("long"), col("py").cast("long"))
    a5InferenceOrder(spark, dir)
      .select("x", "y")
      .crossJoin(broadcast(consts))
      .withColumn("nx", col("x") + expr("i div 3") - 1)
      .withColumn("ny", col("y") + (col("i") % 3) - 1)
      .select("x", "y", "i", "nx", "ny", "cx1", "cy1", "cx2", "cy2", "px", "py")
      .orderBy("x", "y", "i")
  }

  val a18Sql: String = {
    val rows = stitchConsts.map { case (i, a, b, c, d, e, f) => s"($i, $a, $b, $c, $d, $e, $f)" }
    withCtes(false, a4Ctes: _*)(
      s"""SELECT t.x, t.y, CAST(s.i AS BIGINT) AS i,
         |  t.x + (s.i // 3) - 1 AS nx, t.y + (s.i % 3) - 1 AS ny,
         |  CAST(s.cx1 AS BIGINT) AS cx1, CAST(s.cy1 AS BIGINT) AS cy1,
         |  CAST(s.cx2 AS BIGINT) AS cx2, CAST(s.cy2 AS BIGINT) AS cy2,
         |  CAST(s.px AS BIGINT) AS px, CAST(s.py AS BIGINT) AS py
         |FROM (
         |$inferenceBatchSql
         |) t
         |CROSS JOIN (VALUES ${rows.mkString(", ")}) s(i, cx1, cy1, cx2, cy2, px, py)
         |ORDER BY x, y, i""".stripMargin)
  }

  // ---------------------------------------------------------------- A19
  /** Stubbed batch inference (run_inference.py:95-128): deterministic
    * scorer over the 3×3 stitched neighborhood — integer hash sum of the
    * 9 source tiles, one exact double division at the end. Map-side only:
    * the 9-term sum inlines into codegen, no explode/shuffle.
    */
  private def h(a: Column, b: Column): Column =
    ((a * lit(73856093L)) + (b * lit(19349663L))) % 1000

  def a19InferenceScored(spark: SparkSession, dir: String): DataFrame = {
    val terms = for (dc <- -1 to 1; dr <- -1 to 1)
      yield h(col("x") + lit(dc.toLong), col("y") + lit(dr.toLong))
    a5InferenceOrder(spark, dir)
      .select("poly", "x", "y")
      .withColumn("softmax", terms.reduce(_ + _) / lit(9000.0))
      .withColumn("inference_ran", lit(true))
      .orderBy("x", "y")
  }

  val a19Sql: String = {
    val terms = for (dc <- -1 to 1; dr <- -1 to 1)
      yield s"(((x + $dc) * 73856093 + (y + $dr) * 19349663) % 1000)"
    withCtes(false, a4Ctes: _*)(
      s"""SELECT poly, x, y, (${terms.mkString(" + ")}) / 9000.0 AS softmax,
         |  TRUE AS inference_ran
         |FROM (
         |$inferenceBatchSql
         |)
         |ORDER BY x, y""".stripMargin)
  }

  // ---------------------------------------------------------------- A20
  /** Polygons whose inner grid is already calculated
    * (solardb.py:107-118, an EXISTS query) — left-semi join of the
    * polygon dim against the filled grid.
    */
  def a20PolygonsWithGrid(spark: SparkSession, dir: String): DataFrame =
    Polygons.df(spark).select(col("poly"))
      .join(GridOps.fillPolygons(spark), Seq("poly"), "left_semi")
      .orderBy("poly")

  val a20Sql: String = withCtes(false, Polygons.bboxCte, Polygons.edgesCte, Polygons.gridCte)(
    """SELECT b.poly FROM bbox b
      |WHERE EXISTS (SELECT 1 FROM grid g WHERE g.poly = b.poly)
      |ORDER BY poly""".stripMargin)

  // ---------------------------------------------------------------- A21
  /** Inference work queue (solardb.py:205 query_tile_batch: has_image ∧
    * NOT inference_ran, paged LIMIT): cells inside a 20×20 imagery
    * download block (the a11 mark set) that the center-outwards batch
    * (a5/a19) has not scored yet — semi/anti joins on (x, y), total
    * (x, y) order so the page is deterministic.
    */
  val TileBatchSize = 500

  def a21TileBatch(spark: SparkSession, dir: String): DataFrame = {
    val cells = GeoDerive.cells(spark, dir)
    val marked = a11MarkImagery(spark, dir).select("x", "y")
    val scored = a19InferenceScored(spark, dir).select("x", "y")
    cells.join(marked, Seq("x", "y"), "left_semi")
      .join(scored, Seq("x", "y"), "left_anti")
      .select("x", "y", "score", "w")
      .orderBy("x", "y")
      .limit(TileBatchSize)
  }

  val a21Sql: String = withCtes(false, (Seq(GeoDerive.cellsCte, GeoDerive.positivesCte,
    imageryBlockCtes,
    Polygons.bboxCte, Polygons.edgesCte, Polygons.gridCte, Polygons.centroidsCte,
    s"inf AS (\n$inferenceBatchSql\n)")): _*)(
    s"""SELECT c.x, c.y, c.score, c.w FROM cells c
       |WHERE EXISTS (SELECT 1 FROM bg g WHERE g.x = c.x AND g.y = c.y)
       |  AND NOT EXISTS (SELECT 1 FROM inf i WHERE i.x = c.x AND i.y = c.y)
       |ORDER BY x, y LIMIT $TileBatchSize""".stripMargin)

  // ---------------------------------------------------------------- A22
  /** Threshold tiles outside any multi-tile cluster (solardb.py:231-242,
    * query_tiles_over_threshold with filter_clustered=True — cluster_id
    * IS NULL there ⇔ the tile never joined a ≥2-tile component here).
    */
  def a22UnclusteredThreshold(spark: SparkSession, dir: String): DataFrame = {
    val cc = Clustering.componentsFor(spark, dir)
    val singletons = cc.groupBy("cluster_id").agg(count(lit(1)).as("n"))
      .filter(col("n") === 1).select("cluster_id")
    cc.join(singletons, Seq("cluster_id"), "left_semi")
      .select("x", "y", "cluster_id")
      .orderBy("x", "y")
  }

  val a22Sql: String = withCtes(true, GeoDerive.cellsCte, GeoDerive.positivesCte, Clustering.ccCte)(
    """SELECT c.x, c.y, c.cluster_id FROM cc c
      |JOIN (SELECT cluster_id FROM cc GROUP BY cluster_id HAVING COUNT(*) = 1) s
      |  USING (cluster_id)
      |ORDER BY x, y""".stripMargin)

  // ---------------------------------------------------------------- A23
  /** Imagery fetch + slice plan (gather_and_persist_imagery_at_coordinate
    * + slice_image, imagery.py:81-98,146-167): per 20×20 download block,
    * the fetch-center lon/lat (num2deg of the block-center corner,
    * grid_size even → center=False) and the 400 slice rows — target tile
    * coordinate plus crop box in the upsampled source image
    * (1280px · 2^max(ZOOM_FACTOR−1,0) / 20 = 128px per slice).
    */
  val SliceGrid = 20L
  val SliceSide = 128L // MAX_IMAGE_SIDE_LENGTH * 2^(ZOOM_FACTOR-1) / GRID_SIZE

  def a23SlicePlan(spark: SparkSession, dir: String): DataFrame = {
    val blocks = GeoDerive.positives(spark, dir)
      .select(GridOps.blockBase(col("x"), SliceGrid).as("bx"),
        GridOps.blockBase(col("y"), SliceGrid).as("by"))
      .distinct()
    def lon(c: Column) = colToLon(c, center = false)
    def lat(c: Column) = rowToLat(c, center = false)
    blocks
      .withColumn("center_lon", lon(col("bx") + SliceGrid / 2 + TX))
      .withColumn("center_lat", lat(col("by") + SliceGrid / 2 + TY))
      .withColumn("co", explode(sequence(lit(0L), lit(SliceGrid - 1))))
      .repartition(col("bx"), col("by"), col("co"))
      .withColumn("ro", explode(sequence(lit(0L), lit(SliceGrid - 1))))
      .select(col("bx"), col("by"), col("center_lon"), col("center_lat"),
        (col("bx") + col("co")).as("x"), (col("by") + col("ro")).as("y"),
        (col("co") * SliceSide).as("cx1"), (col("ro") * SliceSide).as("cy1"),
        ((col("co") + 1) * SliceSide).as("cx2"), ((col("ro") + 1) * SliceSide).as("cy2"))
      .orderBy("x", "y")
  }

  val a23Sql: String = withCtes(false, GeoDerive.cellsCte, GeoDerive.positivesCte,
    s"""blocks AS (SELECT DISTINCT (x - x % $SliceGrid) AS bx, (y - y % $SliceGrid) AS by FROM pos),
       |bc AS (SELECT bx, by, UNNEST(range(0, $SliceGrid)) AS co FROM blocks),
       |bcr AS (SELECT bx, by, co, UNNEST(range(0, $SliceGrid)) AS ro FROM bc)""".stripMargin)(
    s"""SELECT bx, by,
       |  ${colToLonSql(s"(bx + ${SliceGrid / 2} + $TX)", center = false)} AS center_lon,
       |  ${rowToLatSql(s"(by + ${SliceGrid / 2} + $TY)", center = false)} AS center_lat,
       |  bx + co AS x, by + ro AS y,
       |  co * $SliceSide AS cx1, ro * $SliceSide AS cy1,
       |  (co + 1) * $SliceSide AS cx2, (ro + 1) * $SliceSide AS cy2
       |FROM bcr
       |ORDER BY x, y""".stripMargin)

  // ---------------------------------------------------------------- A24
  /** A24: the meshgrid tile enumeration served by the DSv2
    * [[graft.sources.TileRange]] connector instead of `sequence+explode`
    * — the query asks for a whole zoom-12 tile world (16.8M tiles) and
    * filters a 100×100 bbox; the source's filter pushdown tightens the
    * GENERATED range to exactly the bbox before planning, and column
    * pruning keeps lon/lat ungenerated until projected (TileRangeSpec
    * asserts both on the physical plan). Oracle = the same grid via
    * generate_series and the shared num2deg SQL fragments.
    */
  val A24Zoom = 12
  def a24TileSource(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("tilerange")
      .option("minX", 0).option("maxX", (1 << A24Zoom) - 1)
      .option("minY", 0).option("maxY", (1 << A24Zoom) - 1)
      .option("zoom", A24Zoom)
      .load()
      .filter(col("x").between(2048, 2147) && col("y").between(1300, 1399))
      .select(col("x"), col("y"),
        round(col("lon"), 6).as("lon"), round(col("lat"), 6).as("lat"))
      .orderBy("x", "y")

  val a24Sql: String =
    s"""SELECT gx.x AS x, gy.y AS y,
       |  ${colToLonSql("gx.x", A24Zoom)} AS lon,
       |  ${rowToLatSql("gy.y", A24Zoom)} AS lat
       |FROM generate_series(2048, 2147) gx(x), generate_series(1300, 1399) gy(y)
       |ORDER BY x, y""".stripMargin

  // ---------------------------------------------------------------- A26
  /** A26: quadkey encoding — the Bing-maps tile addressing scheme every
    * slippy-tile ecosystem interoperates with (digit i from the MSB is
    * `2·bit_i(y) + bit_i(x)`, one digit per zoom level). Zoom-12 keys
    * for the z21-derived tiles (9-bit shift), computed as a pure
    * higher-order-function string fold — map-side only, identical
    * integer bit math on both engines. Quadkeys sort by Z-order, so the
    * key doubles as a locality-preserving partition/cluster key at
    * scale (prefix = parent tile).
    */
  val QkZoom = 12
  def a26Quadkey(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        ((col("l_orderkey") % lit(2097152L)) / lit(512L)).cast("long").as("qx"),
        (((col("l_partkey") * lit(104729L)) % lit(2097152L)) / lit(512L)).cast("long").as("qy"))
      .withColumn("quadkey", concat_ws("",
        transform(sequence(lit(QkZoom - 1), lit(0), lit(-1)), i => {
          def bit(c: Column) = floor(c / pow(lit(2.0), i)).cast("long") % 2
          (bit(col("qy")) * 2 + bit(col("qx"))).cast("string")
        })))
      .orderBy("l_orderkey", "l_linenumber")

  val a26Sql: String =
    s"""SELECT l_orderkey, l_linenumber,
       |  (l_orderkey % 2097152) // 512 AS qx,
       |  ((l_partkey * 104729) % 2097152) // 512 AS qy,
       |  array_to_string(list_transform(range(${QkZoom - 1}, -1, -1),
       |    i -> CAST((((((l_partkey * 104729) % 2097152) // 512) // (1 << i)) % 2) * 2
       |            + (((l_orderkey % 2097152) // 512) // (1 << i)) % 2 AS VARCHAR)), '') AS quadkey
       |FROM lineitem
       |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------------- A27
  /** A27: tile-pyramid rollup — per-tile observation counts and max
    * score aggregated up the zoom pyramid (z21 → z18 → z15 → z12), the
    * heatmap-tiles shape every slippy-map overlay renders from. Parent
    * coords are integer right-shifts of the child's; the explode over
    * levels happens in the scan stage so one pass feeds every level,
    * and each level's aggregate is partial (map-side combinable) on its
    * own (zoom, px, py) key. At scale this materializes the same
    * pyramid a tile server pre-computes, in one shuffle.
    */
  val PyramidZooms: Seq[Int] = Seq(21, 18, 15, 12)

  def a27Pyramid(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .select(
        (col("l_orderkey") % lit(2097152L)).as("tx"),
        ((col("l_partkey") * lit(104729L)) % lit(2097152L)).as("ty"),
        GeoDerive.scoreCol.as("score"))
      .select(col("tx"), col("ty"), col("score"),
        explode(lit(PyramidZooms.toArray)).as("zoom"))
      .withColumn("px", expr("tx div cast(pow(2, 21 - zoom) as bigint)"))
      .withColumn("py", expr("ty div cast(pow(2, 21 - zoom) as bigint)"))
      .groupBy("zoom", "px", "py")
      .agg(count(lit(1)).as("n"), round(max("score"), 6).as("max_score"))
      .orderBy("zoom", "px", "py")

  val a27Sql: String =
    s"""SELECT z.zoom, (l_orderkey % 2097152) // CAST(pow(2, 21 - z.zoom) AS BIGINT) AS px,
       |  ((l_partkey * 104729) % 2097152) // CAST(pow(2, 21 - z.zoom) AS BIGINT) AS py,
       |  COUNT(*) AS n,
       |  round(MAX((((l_orderkey * 2654435761) + (l_partkey * 40503)) % 1000) / 1000.0), 6) AS max_score
       |FROM lineitem, (SELECT UNNEST([${PyramidZooms.mkString(", ")}]) AS zoom) z
       |GROUP BY 1, 2, 3
       |ORDER BY 1, 2, 3""".stripMargin

  // --------------------------------------------------- clustered challenge
  /** One MapRoulette challenge document per unmapped cluster with its
    * ASSEMBLED outline polygon (create_clustered_maproulette_geojson,
    * maproulette.py:36-66,91-99): a15's boundary edge set → Outline ring
    * chaining (outer CCW first, holes CW after) → lon/lat vertices →
    * one GeoJSON FeatureCollection line. Not driver-oracle-checked (ring
    * chaining has no SQL twin); PipelineSpec covers it.
    */
  def clusteredChallenge(spark: SparkSession, dir: String): DataFrame = {
    val unmapped = a13SpatialAntijoin(spark, dir).select("cluster_id")
    val edges = a15ClusterOutline(spark, dir)
      .join(unmapped, Seq("cluster_id"), "left_semi")
    def lon(c: Column) = colToLon(c + lit(TX), center = false)
    def lat(c: Column) = rowToLat(c + lit(TY), center = false)
    Outline.assembleRings(edges).toDF()
      .withColumn("pts", arrays_zip(col("xs"), col("ys")))
      // GeoJSON rings are explicitly closed: repeat the first vertex
      .withColumn("pts", concat(col("pts"), slice(col("pts"), 1, 1)))
      .withColumn("ring_json", concat(lit("["),
        array_join(transform(col("pts"), p =>
          format_string("[%.6f, %.6f]", lon(p("xs")), lat(p("ys")))), ", "),
        lit("]")))
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_rings"), array_join(
        transform(array_sort(collect_list(struct(col("ring_idx"), col("ring_json")))),
          r => r("ring_json")), ", ").as("rings_json"))
      .select(col("cluster_id"), col("n_rings"), format_string(challengeFmt,
        col("cluster_id"), col("rings_json")).as("geojson"))
      .orderBy("cluster_id")
  }

  /** The hash-checkable face of [[clusteredChallenge]] — the SAME build
    * (ring chaining → formatting → one FeatureCollection line per
    * cluster), summarized into driver-comparable integers: ring count
    * from the assembly itself plus the document's exact length and
    * order-invariant coordinate-token fingerprint (the
    * [[a25GeojsonFingerprint]] quantities, recomputed FROM the emitted
    * string). The DuckDB twin rebuilds all four from first principles,
    * so the challenge row itself is now oracle-green rather than
    * rows-only.
    */
  def a25ChallengeChecked(spark: SparkSession, dir: String): DataFrame =
    clusteredChallenge(spark, dir)
      .select(col("cluster_id"), col("n_rings"),
        length(col("geojson")).cast("long").as("n_chars"),
        expr("""regexp_extract_all(geojson, '\\[-?\\d+\\.\\d{6}, -?\\d+\\.\\d{6}\\]', 0)""")
          .as("toks"))
      .select(col("cluster_id"), col("n_rings"), col("n_chars"),
        size(col("toks")).cast("long").as("n_tok"),
        expr("""aggregate(toks, 0L, (acc, t) -> acc +
               |  aggregate(sequence(1, length(t)), 0L,
               |            (a, i) -> a + ascii(substring(t, i, 1)) * i))"""
          .stripMargin).as("tok_fp"))
      .orderBy("cluster_id")

  /** Vertex id packing for the a25 oracles' CCs: coords are 0-based cell
    * space (≪ 2^22), so vid = x·2^22 + y is collision-free and its
    * integer order IS the lexicographic (x, y) vertex order — MIN(vid)
    * decodes straight back to the component's min vertex. (Declared
    * before first use: object vals initialize in declaration order.)
    */
  private val VidShift = 4194304L

  // --------------------------------------------------------------- A25fp
  /** Fingerprint of the ASSEMBLED a25 FeatureCollection line — the
    * direct oracle on the emitted document that a25_ring_stats'
    * component stats deliberately stopped short of: per cluster, the
    * exact character count of the GeoJSON string plus an ORDER-INVARIANT
    * hash over its coordinate tokens (Σ over tokens of
    * Σ char_code·position — order-sensitive inside a token, insensitive
    * across tokens). Length pins the template, ring count and every
    * separator; the token hash pins every formatted coordinate pair
    * including the per-ring closing repeats. Only the SEQUENCE of tokens
    * stays unpinned — and winding/coverage of each ring is already
    * hash-checked by a25_ring_stats.
    *
    * Computed FROM the real document string (regexp token scan), so a
    * bug anywhere in the chaining → formatting path shifts a hash. The
    * DuckDB twin reassembles the same quantities from first principles:
    * interior-left DIRECTED boundary edges, ring decomposition as the
    * cycles of the left-turn successor permutation, each ring starting
    * (and closing) at its min vertex. `chainEdges` walks the IDENTICAL
    * directed permutation — the two sides agree by construction, not by
    * test coverage (the round-6 pinch/hole specs pin the contract).
    */
  def a25GeojsonFingerprint(spark: SparkSession, dir: String): DataFrame =
    clusteredChallenge(spark, dir)
      .select(col("cluster_id"),
        length(col("geojson")).cast("long").as("n_chars"),
        expr("""regexp_extract_all(geojson, '\\[-?\\d+\\.\\d{6}, -?\\d+\\.\\d{6}\\]', 0)""")
          .as("toks"))
      .select(col("cluster_id"), col("n_chars"),
        size(col("toks")).cast("long").as("n_tok"),
        expr("""aggregate(toks, 0L, (acc, t) -> acc +
               |  aggregate(sequence(1, length(t)), 0L,
               |            (a, i) -> a + ascii(substring(t, i, 1)) * i))"""
          .stripMargin).as("tok_fp"))
      .orderBy("cluster_id")

  /** The a25 document template ([[clusteredChallenge]]) — one definition
    * shared with the fingerprint oracle's base-length computation.
    */
  private val challengeFmt =
    """{"type": "FeatureCollection", "features": [{"type": "Feature", "properties": {"cluster_id": %d}, "geometry": {"type": "Polygon", "coordinates": [%s]}}]}"""

  /** Pointer-doubling depth for the ring-walk oracle. rd_k's min-window
    * spans 2^k + 1 consecutive edges (rd0 covers positions {0,1}; each
    * level unions two windows overlapping at one position), so the final
    * window is 2^RingDoublings + 1 = 65,537 edges >= any possible ring
    * length (<= 4 directed boundary edges per grid cell, grid
    * modulo-bounded at 97x89 => <= 34,532) — exact at every SF by
    * construction.
    */
  private val RingDoublings = 16

  val a25GeojsonFpSql: String = a25FpSql(withRings = false)

  /** Oracle for [[a25ChallengeChecked]]: the fingerprint reconstruction
    * plus the ring count the assembly reports (rstat.n_rings — one ring
    * per closing-repeat vertex, i.e. per successor-permutation cycle).
    */
  val a25CheckedSql: String = a25FpSql(withRings = true)

  private def a25FpSql(withRings: Boolean): String = {
    val lonS = colToLonSql(s"(sx + $TX)", center = false)
    val latS = rowToLatSql(s"(sy + $TY)", center = false)
    withCtes(true, GeoDerive.cellsCte, GeoDerive.positivesCte,
      Clustering.ccCte, GeoDerive.nodesCte,
      s"""ccu AS MATERIALIZED (
         |  SELECT c.* FROM cc c WHERE NOT EXISTS (
         |    SELECT 1 FROM (SELECT DISTINCT nx, ny FROM nodes) n
         |    JOIN cc c2 ON c2.x = n.nx AND c2.y = n.ny
         |    WHERE c2.cluster_id = c.cluster_id)),
         |tedge5 AS (
         |  SELECT cluster_id, x AS x1, y AS y1, x + 1 AS x2, y AS y2, x AS tx, y AS ty FROM ccu
         |  UNION ALL SELECT cluster_id, x, y + 1, x + 1, y + 1, x, y FROM ccu
         |  UNION ALL SELECT cluster_id, x, y, x, y + 1, x, y FROM ccu
         |  UNION ALL SELECT cluster_id, x + 1, y, x + 1, y + 1, x, y FROM ccu),
         |fbedge AS MATERIALIZED (
         |  SELECT cluster_id, x1, y1, x2, y2, MAX(tx) AS tx, MAX(ty) AS ty
         |  FROM tedge5 GROUP BY cluster_id, x1, y1, x2, y2 HAVING COUNT(*) = 1),
         |dedge AS MATERIALIZED (
         |  -- interior-left orientation: horizontal edges run +x when the
         |  -- tile is above (ty = y1), -x when below; vertical edges run
         |  -- -y when the tile is right of the edge (tx = x1), +y when left
         |  SELECT cluster_id,
         |    CASE WHEN y1 = y2 THEN (CASE WHEN ty = y1 THEN x1 ELSE x2 END) ELSE x1 END AS sx,
         |    CASE WHEN y1 = y2 THEN y1 ELSE (CASE WHEN tx = x1 THEN y2 ELSE y1 END) END AS sy,
         |    CASE WHEN y1 = y2 THEN (CASE WHEN ty = y1 THEN 1 ELSE -1 END) ELSE 0 END AS hx,
         |    CASE WHEN y1 = y2 THEN 0 ELSE (CASE WHEN tx = x1 THEN -1 ELSE 1 END) END AS hy
         |  FROM fbedge),
         |dedge2 AS MATERIALIZED (
         |  SELECT cluster_id, sx, sy, hx, hy, sx + hx AS ex, sy + hy AS ey,
         |    (sx * $VidShift + sy) * 4
         |      + (CASE WHEN hx = 1 THEN 0 WHEN hx = -1 THEN 1 WHEN hy = 1 THEN 2 ELSE 3 END) AS eid
         |  FROM dedge),
         |succ AS MATERIALIZED (
         |  -- left-turn-first successor: at a pinch (out-degree 2) the
         |  -- left turn is always available and is the non-crossing
         |  -- pairing chainEdges walks; deg-2 vertices have one choice
         |  SELECT e.cluster_id, e.eid,
         |    arg_min(o.eid, CASE WHEN o.hx = -e.hy AND o.hy = e.hx THEN 0 ELSE 1 END) AS nxt
         |  FROM dedge2 e JOIN dedge2 o
         |    ON o.cluster_id = e.cluster_id AND o.sx = e.ex AND o.sy = e.ey
         |  GROUP BY e.cluster_id, e.eid),
         |-- ring id = min eid on each successor cycle, via pointer
         |-- doubling instead of a recursive closure (whose working set
         |-- is quadratic in ring length): rd_k carries, per edge, the
         |-- successor at distance 2^(k+1) and the min eid over that
         |-- window. succ is a permutation (each directed boundary edge
         |-- has exactly one predecessor under the left-turn pairing), so
         |-- every eid lies on a cycle of length <= |dedge2| <= 4*97*89 =
         |-- 34,532 < 2^16 — the final window provably covers any ring.
         |${(0 to RingDoublings).map {
              case 0 => "rd0 AS MATERIALIZED (SELECT s.eid, s.nxt, LEAST(s.eid, s.nxt) AS mn FROM succ s)"
              case k => s"rd$k AS MATERIALIZED (SELECT a.eid, b.nxt, LEAST(a.mn, b.mn) AS mn FROM rd${k - 1} a JOIN rd${k - 1} b ON b.eid = a.nxt)"
            }.mkString(",\n")},
         |ring AS MATERIALIZED (
         |  SELECT d.cluster_id, d.eid, d.sx, d.sy, m.mn AS ring
         |  FROM dedge2 d JOIN rd$RingDoublings m ON m.eid = d.eid),
         |vtok AS MATERIALIZED (
         |  SELECT cluster_id, sx, sy, printf('[%.6f, %.6f]', $lonS, $latS) AS t
         |  FROM (SELECT DISTINCT cluster_id, sx, sy FROM dedge2)),
         |tokm AS MATERIALIZED (
         |  SELECT cluster_id, sx, sy, CAST(length(t) AS BIGINT) AS tl,
         |    CAST(list_sum(list_transform(range(1, length(t) + 1),
         |      i -> unicode(substring(t, CAST(i AS INT), 1)) * i)) AS BIGINT) AS th
         |  FROM vtok),
         |rings AS MATERIALIZED (
         |  -- the directed walk starts every ring at its min vertex, so
         |  -- the emitted first (= closing-repeat) vertex is MIN(vid)
         |  SELECT r.cluster_id, r.ring,
         |    MIN(r.sx * $VidShift + r.sy) // $VidShift AS mx,
         |    MIN(r.sx * $VidShift + r.sy) % $VidShift AS my
         |  FROM ring r GROUP BY r.cluster_id, r.ring),
         |rclose AS (
         |  SELECT r.cluster_id, t.tl, t.th
         |  FROM rings r JOIN tokm t ON t.cluster_id = r.cluster_id
         |    AND t.sx = r.mx AND t.sy = r.my),
         |estat2 AS (
         |  SELECT d.cluster_id, COUNT(*) AS n_edges,
         |    CAST(SUM(t.tl) AS BIGINT) AS sum_tl, CAST(SUM(t.th) AS BIGINT) AS sum_th
         |  FROM ring d JOIN tokm t
         |    ON t.cluster_id = d.cluster_id AND t.sx = d.sx AND t.sy = d.sy
         |  GROUP BY d.cluster_id),
         |rstat AS (
         |  SELECT cluster_id, COUNT(*) AS n_rings,
         |    CAST(SUM(tl) AS BIGINT) AS rsum_tl, CAST(SUM(th) AS BIGINT) AS rsum_th
         |  FROM rclose GROUP BY cluster_id)""".stripMargin)(
      s"""SELECT e.cluster_id,
         |${if (withRings) "  CAST(r.n_rings AS BIGINT) AS n_rings," else ""}
         |  CAST(length(printf('$challengeFmt', e.cluster_id, ''))
         |    + 4 * r.n_rings + e.sum_tl + r.rsum_tl + 2 * e.n_edges - 2 AS BIGINT) AS n_chars,
         |  CAST(e.n_edges + r.n_rings AS BIGINT) AS n_tok,
         |  CAST(e.sum_th + r.rsum_th AS BIGINT) AS tok_fp
         |FROM estat2 e JOIN rstat r USING (cluster_id)
         |ORDER BY cluster_id""".stripMargin)
  }

  // ---------------------------------------------------------------- A25b
  /** A25 companion with a hash-checked oracle: per boundary-COMPONENT
    * stats of the assembled outline rings (rings sharing a pinch vertex
    * merged — [[Outline.componentStats]] explains why that granularity
    * is exactly what a SQL twin can recompute). The Spark side goes
    * through the REAL `chainEdges` walk + winding post-pass, so this
    * closes the one rows-only gap the a25 GeoJSON had: edge coverage,
    * winding signs and extents of every ring are now DuckDB-verified;
    * only the pinch pairing choice (invisible at component level by
    * construction) stays spec-checked in OutlinePropSpec. The oracle
    * recomputes components with a recursive min-label propagation over
    * the undirected boundary edges (535 components, ≤870 vertices each
    * at sf0.01) and the signed area as the interior-left edge sum
    * Σ ±2x·dy — the same identity `chainEdges`' shoelace satisfies
    * (validated ring-by-ring, 955/955, before shipping).
    */
  def a25RingStats(spark: SparkSession, dir: String): DataFrame = {
    val edges = a15ClusterOutline(spark, dir)
    import spark.implicits._
    Outline.assembleRings(edges)
      .groupByKey(_.cluster_id)
      .flatMapGroups { (cid: Long, it: Iterator[Outline.Ring]) =>
        Outline.componentStats(cid, it.map(r => r.xs.zip(r.ys).toVector).toSeq).iterator
      }
      .toDF()
      .orderBy("cluster_id", "comp_x", "comp_y")
  }

  /** Outline-graph CC unroll depth for the ring-stats oracle: observed
    * max 33 hook+jump rounds (sf0.01) + margin — see
    * [[Clustering.minLabelCtes]] for the calibration story.
    */
  private val OutlineCcRounds = 44

  val a25RingStatsSql: String = withCtes(true, GeoDerive.cellsCte, GeoDerive.positivesCte,
    Clustering.ccCte,
    s"""tedge4 AS MATERIALIZED (
       |  SELECT cluster_id, x AS x1, y AS y1, x + 1 AS x2, y AS y2, x AS tx, y AS ty FROM cc
       |  UNION ALL SELECT cluster_id, x, y + 1, x + 1, y + 1, x, y FROM cc
       |  UNION ALL SELECT cluster_id, x, y, x, y + 1, x, y FROM cc
       |  UNION ALL SELECT cluster_id, x + 1, y, x + 1, y + 1, x, y FROM cc
       |),
       |bedge AS MATERIALIZED (
       |  SELECT cluster_id, x1, y1, x2, y2, MAX(tx) AS tx
       |  FROM tedge4 GROUP BY cluster_id, x1, y1, x2, y2 HAVING COUNT(*) = 1
       |),
       |adj AS MATERIALIZED (
       |  SELECT cluster_id, x1 * $VidShift + y1 AS a, x2 * $VidShift + y2 AS b FROM bedge
       |  UNION ALL
       |  SELECT cluster_id, x2 * $VidShift + y2, x1 * $VidShift + y1 FROM bedge
       |),
       |verts AS MATERIALIZED (SELECT DISTINCT cluster_id, a AS v FROM adj),
       |oadj AS (SELECT cluster_id, a AS src, b AS dst FROM adj),
       |${Clustering.minLabelCtes("oc", OutlineCcRounds, Seq("cluster_id"), "verts", "v", "oadj").mkString(",\n")},
       |comp AS MATERIALIZED (SELECT cluster_id, v AS node, lbl AS comp FROM oc_m$OutlineCcRounds),
       |vdeg AS MATERIALIZED (SELECT cluster_id, a AS v, COUNT(*) AS deg FROM adj GROUP BY cluster_id, a),
       |estat AS MATERIALIZED (
       |  SELECT e.cluster_id, c.comp,
       |    COUNT(*) AS n_edges,
       |    SUM(CASE WHEN e.x1 = e.x2
       |        THEN 2 * e.x1 * (CASE WHEN e.tx = e.x1 - 1 THEN 1 ELSE -1 END)
       |        ELSE 0 END) AS area2,
       |    MIN(LEAST(e.x1, e.x2)) AS min_x, MIN(LEAST(e.y1, e.y2)) AS min_y,
       |    MAX(GREATEST(e.x1, e.x2)) AS max_x, MAX(GREATEST(e.y1, e.y2)) AS max_y
       |  FROM bedge e JOIN comp c
       |    ON c.cluster_id = e.cluster_id AND c.node = e.x1 * $VidShift + e.y1
       |  GROUP BY e.cluster_id, c.comp
       |),
       |pstat AS MATERIALIZED (
       |  SELECT d.cluster_id, c.comp, COUNT(*) FILTER (WHERE d.deg = 4) AS n_pinch
       |  FROM vdeg d JOIN comp c ON c.cluster_id = d.cluster_id AND c.node = d.v
       |  GROUP BY d.cluster_id, c.comp
       |)""".stripMargin)(
    s"""SELECT e.cluster_id,
       |  e.comp // $VidShift AS comp_x, e.comp % $VidShift AS comp_y,
       |  CAST(e.n_edges AS BIGINT) AS n_edges, CAST(e.area2 AS BIGINT) AS area2,
       |  e.min_x, e.min_y, e.max_x, e.max_y,
       |  CAST(p.n_pinch AS BIGINT) AS n_pinch
       |FROM estat e JOIN pstat p ON p.cluster_id = e.cluster_id AND p.comp = e.comp
       |ORDER BY e.cluster_id, comp_x, comp_y""".stripMargin)

  // ---------------------------------------------------------------- A28
  /** A28: degenerate-geometry QA (get_degenerate_cities,
    * gather_city_shapes.py:61-74) — the reference's data-hygiene pass
    * that flags city shapes OSM returned as something other than a
    * usable polygon before any tiling runs. Re-expressed over a
    * lineitem-derived polygon corpus (vertex i of shape o = row i of
    * order o): a shape is degenerate when it has <3 DISTINCT vertices
    * (the point/linestring case) or zero shoelace area (collinear
    * ring). One lead-window per shape (partitions bounded by
    * lines-per-order, ≤7) for the closing-edge shoelace, then a
    * partial-agg groupBy — no skew surface at any corpus size, exact
    * integer math on both engines.
    */
  def a28DegeneratePolygons(spark: SparkSession, dir: String): DataFrame = {
    // l_linenumber repeats within an order in the testdata, so the ring
    // order tiebreaks on the vertex itself — remaining ties are
    // coincident points, which cannot move the shoelace sum.
    val w = Window.partitionBy("shape_id").orderBy("vseq", "vx", "vy")
    val verts = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey").as("shape_id"), col("l_linenumber").as("vseq"),
        (col("l_partkey") % 97L).as("vx"),
        when(col("l_orderkey") % 7L === 0L, col("l_partkey") % 97L)
          .otherwise((col("l_partkey") * 31L) % 89L).as("vy"))
    verts
      .withColumn("nx", coalesce(lead("vx", 1).over(w), first("vx").over(w)))
      .withColumn("ny", coalesce(lead("vy", 1).over(w), first("vy").over(w)))
      .groupBy("shape_id")
      .agg(count(lit(1)).as("n_points"),
        countDistinct(col("vx"), col("vy")).as("n_distinct"),
        abs(sum(col("vx") * col("ny") - col("nx") * col("vy"))).as("area2"))
      .withColumn("status",
        when(col("n_distinct") < 3, "too_few_points")
          .when(col("area2") === 0, "zero_area")
          .otherwise("ok"))
      .orderBy("shape_id")
  }

  val a28Sql: String =
    """WITH verts AS (
      |  SELECT l_orderkey AS shape_id, l_linenumber AS vseq,
      |    l_partkey % 97 AS vx,
      |    CASE WHEN l_orderkey % 7 = 0 THEN l_partkey % 97
      |         ELSE (l_partkey * 31) % 89 END AS vy
      |  FROM lineitem
      |),
      |ring AS (
      |  SELECT shape_id, vx, vy,
      |    COALESCE(LEAD(vx) OVER w, FIRST_VALUE(vx) OVER w) AS nx,
      |    COALESCE(LEAD(vy) OVER w, FIRST_VALUE(vy) OVER w) AS ny
      |  FROM verts
      |  WINDOW w AS (PARTITION BY shape_id ORDER BY vseq, vx, vy
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |)
      |SELECT shape_id, COUNT(*) AS n_points,
      |  COUNT(DISTINCT (vx, vy)) AS n_distinct,
      |  CAST(abs(SUM(vx * ny - nx * vy)) AS BIGINT) AS area2,
      |  CASE WHEN COUNT(DISTINCT (vx, vy)) < 3 THEN 'too_few_points'
      |       WHEN abs(SUM(vx * ny - nx * vy)) = 0 THEN 'zero_area'
      |       ELSE 'ok' END AS status
      |FROM ring GROUP BY shape_id
      |ORDER BY shape_id""".stripMargin

  // ---------------------------------------------------------------- A29
  /** A29: upsample-aware slice plan (double_image_size + slice_image,
    * imagery.py:99-101,81-98): the reference doubles the fetched image
    * `upsample_count` times BEFORE cutting the slices_per_side² grid,
    * so the crop-box math scales with 2^u while the target tile coords
    * don't. a23 bakes u=max(ZOOM_FACTOR−1,0)=1 into a constant; this
    * models the doubling chain explicitly over u ∈ {0,1,2} per imagery
    * block — pure integer column math on an explode, partition-local.
    */
  val UpsampleBasePx = 1280L // MAX_IMAGE_SIDE_LENGTH, imagery.py:107
  def a29UpsampleSlice(spark: SparkSession, dir: String): DataFrame = {
    val blocks = GeoDerive.positives(spark, dir)
      .select(GridOps.blockBase(col("x"), SliceGrid).as("bx"),
        GridOps.blockBase(col("y"), SliceGrid).as("by"))
      .distinct()
    blocks
      .withColumn("u", explode(sequence(lit(0L), lit(2L))))
      .withColumn("out_px", lit(UpsampleBasePx) * expr("shiftleft(1L, cast(u as int))"))
      .withColumn("slice_px", expr(s"out_px div $SliceGrid"))
      .withColumn("co", explode(sequence(lit(0L), lit(SliceGrid - 1))))
      .repartition(col("bx"), col("by"), col("co"))
      .withColumn("ro", explode(sequence(lit(0L), lit(SliceGrid - 1))))
      .select(col("bx"), col("by"), col("u"), col("out_px"),
        (col("bx") + col("co")).as("x"), (col("by") + col("ro")).as("y"),
        (col("co") * col("slice_px")).as("cx1"), (col("ro") * col("slice_px")).as("cy1"),
        ((col("co") + 1) * col("slice_px")).as("cx2"),
        ((col("ro") + 1) * col("slice_px")).as("cy2"))
      .orderBy("u", "x", "y")
  }

  val a29Sql: String = withCtes(false, GeoDerive.cellsCte, GeoDerive.positivesCte,
    s"""blocks AS (SELECT DISTINCT (x - x % $SliceGrid) AS bx, (y - y % $SliceGrid) AS by FROM pos),
       |bu AS (SELECT bx, by, UNNEST(range(0, 3)) AS u FROM blocks),
       |buc AS (SELECT bx, by, u, $UpsampleBasePx * (1 << u) AS out_px,
       |               ($UpsampleBasePx * (1 << u)) // $SliceGrid AS slice_px,
       |               UNNEST(range(0, $SliceGrid)) AS co FROM bu),
       |bucr AS (SELECT bx, by, u, out_px, slice_px, co,
       |                UNNEST(range(0, $SliceGrid)) AS ro FROM buc)""".stripMargin)(
    s"""SELECT bx, by, u, out_px,
       |  bx + co AS x, by + ro AS y,
       |  co * slice_px AS cx1, ro * slice_px AS cy1,
       |  (co + 1) * slice_px AS cx2, (ro + 1) * slice_px AS cy2
       |FROM bucr
       |ORDER BY u, x, y""".stripMargin)

  // ---------------------------------------------------------------- A30
  /** A30: numeric Morton z-value for the z21-derived tiles — the sort
    * key [[graft.scale.ZOrder.writeZOrdered]] clusters files by (a26's
    * quadkey is the same curve as a string prefix; this is the integer
    * form). Driver-checked here so the layout writer's key math has a
    * DuckDB twin: identical shift/mask interleave on both engines.
    */
  val ZBits = 12
  def a30Zorder(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        ((col("l_orderkey") % lit(2097152L)) / lit(512L)).cast("long").as("qx"),
        (((col("l_partkey") * lit(104729L)) % lit(2097152L)) / lit(512L)).cast("long").as("qy"))
      .withColumn("z", graft.scale.ZOrder.zValue(col("qx"), col("qy"), ZBits))
      .orderBy("l_orderkey", "l_linenumber")

  val a30Sql: String =
    s"""SELECT l_orderkey, l_linenumber,
       |  (l_orderkey % 2097152) // 512 AS qx,
       |  ((l_partkey * 104729) % 2097152) // 512 AS qy,
       |  CAST(list_sum(list_transform(range(0, $ZBits), i ->
       |    ((((l_orderkey % 2097152) // 512 >> i) & 1) << (2*i))
       |    + (((((l_partkey * 104729) % 2097152) // 512 >> i) & 1) << (2*i + 1)))) AS BIGINT) AS z
       |FROM lineitem
       |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------------- A43
  /** A43: z-order range decomposition — turn a spatial bbox predicate
    * into the MINIMAL set of contiguous z-key ranges at a granularity
    * floor (the BigTable/HBase/Delta scan-planning step: a z-ordered
    * 100 TB table prunes files by KEY RANGE, so every bbox query must
    * first become ranges; a26/a30 build the curve, this is the query
    * side that makes the layout pay off). Per l_returnflag the
    * "middle-half" bbox of its a30 z-space points decomposes by
    * quadtree walk: a node fully inside the box emits its whole z
    * interval (one contiguous range BY the curve's construction — the
    * point of Morton order), a partial node splits until the
    * [[ZrLmin]] granularity floor, where it emits as a SUPERSET (scan
    * pruning may over-read, never under-read — the exact filter runs
    * after the scan); adjacent ranges then merge (gaps-and-islands,
    * b29's trick). The walk carries (x0, y0) as recursion columns
    * (b46's bounds-as-columns form) so no deinterleave runs per node.
    *
    * Scale shape: the CORPUS work is one map-side bbox agg; the
    * decomposition is planning state — O(perimeter/2^Lmin) nodes per
    * box, driver-sized by definition (a24's TileRange argues the same
    * for its range splitting), rejoined to nothing. Oracle = the
    * identical walk as a WITH RECURSIVE quadrant recursion.
    */
  val ZrLmin = 6

  def a43ZrangePlan(spark: SparkSession, dir: String): DataFrame = {
    val pts = Tables(spark, dir, "lineitem").select(
      col("l_returnflag").as("flag"),
      ((col("l_orderkey") % lit(2097152L)) / lit(512L)).cast("long").as("qx"),
      (((col("l_partkey") * lit(104729L)) % lit(2097152L)) / lit(512L)).cast("long").as("qy"))
    val boxes = pts.groupBy("flag")
      .agg(min("qx").as("x0"), max("qx").as("x1"),
        min("qy").as("y0"), max("qy").as("y1"))
      .collect()
      .map { r =>
        val (x0, x1, y0, y1) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
        (r.getString(0),
          x0 + (x1 - x0 + 1) / 4, x0 + 3 * (x1 - x0 + 1) / 4,
          y0 + (y1 - y0 + 1) / 4, y0 + 3 * (y1 - y0 + 1) / 4)
      }
      .sortBy(_._1)
    val rows = boxes.flatMap { case (flag, bx0, bx1, by0, by1) =>
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      def walk(lvl: Int, zp: Long, x0: Long, y0: Long): Unit = {
        val s = 1L << lvl
        if (x0 > bx1 || x0 + s - 1 < bx0 || y0 > by1 || y0 + s - 1 < by0) return
        val full = x0 >= bx0 && x0 + s - 1 <= bx1 && y0 >= by0 && y0 + s - 1 <= by1
        if (full || lvl <= ZrLmin)
          out += ((zp << (2 * lvl), ((zp + 1L) << (2 * lvl)) - 1L))
        else (0 until 4).foreach { c =>
          walk(lvl - 1, zp * 4 + c,
            x0 + (c & 1).toLong * (s >> 1), y0 + ((c >> 1) & 1).toLong * (s >> 1))
        }
      }
      walk(ZBits, 0L, 0L, 0L)
      val merged = out.sortBy(_._1).foldLeft(List.empty[(Long, Long)]) {
        case ((plo, phi) :: tail, (lo, hi)) if lo == phi + 1 => (plo, hi) :: tail
        case (acc, r) => r :: acc
      }.reverse
      merged.zipWithIndex.map { case ((lo, hi), i) =>
        (flag, (i + 1).toLong, lo, hi, hi - lo + 1)
      }
    }
    import pts.sparkSession.implicits._
    rows.toSeq.toDF("flag", "rk", "z_lo", "z_hi", "n_cells")
      .orderBy("flag", "rk")
  }

  val a43Sql: String =
    s"""WITH RECURSIVE pts AS (
       |  SELECT l_returnflag AS flag,
       |    (l_orderkey % 2097152) // 512 AS qx,
       |    ((l_partkey * 104729) % 2097152) // 512 AS qy
       |  FROM lineitem
       |), boxes AS (
       |  SELECT flag,
       |    MIN(qx) + (MAX(qx) - MIN(qx) + 1) // 4 AS bx0,
       |    MIN(qx) + 3 * (MAX(qx) - MIN(qx) + 1) // 4 AS bx1,
       |    MIN(qy) + (MAX(qy) - MIN(qy) + 1) // 4 AS by0,
       |    MIN(qy) + 3 * (MAX(qy) - MIN(qy) + 1) // 4 AS by1
       |  FROM pts GROUP BY flag
       |), nodes(flag, lvl, zp, x0, y0, bx0, bx1, by0, by1) AS (
       |  SELECT flag, $ZBits, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
       |    CAST(0 AS BIGINT), bx0, bx1, by0, by1
       |  FROM boxes
       |  UNION ALL
       |  SELECT n.flag, n.lvl - 1, n.zp * 4 + c.c,
       |    n.x0 + (c.c % 2) * (CAST(1 AS BIGINT) << (n.lvl - 1)),
       |    n.y0 + (c.c // 2) * (CAST(1 AS BIGINT) << (n.lvl - 1)),
       |    n.bx0, n.bx1, n.by0, n.by1
       |  FROM nodes n, (SELECT UNNEST([CAST(0 AS BIGINT), 1, 2, 3]) AS c) c
       |  WHERE n.lvl > $ZrLmin
       |    -- the parent overlaps the box but is not fully inside: split
       |    AND NOT (n.x0 > n.bx1 OR n.x0 + (CAST(1 AS BIGINT) << n.lvl) - 1 < n.bx0
       |          OR n.y0 > n.by1 OR n.y0 + (CAST(1 AS BIGINT) << n.lvl) - 1 < n.by0)
       |    AND NOT (n.x0 >= n.bx0 AND n.x0 + (CAST(1 AS BIGINT) << n.lvl) - 1 <= n.bx1
       |         AND n.y0 >= n.by0 AND n.y0 + (CAST(1 AS BIGINT) << n.lvl) - 1 <= n.by1)
       |), emitted AS (
       |  SELECT flag, zp << (2 * lvl) AS z_lo,
       |    ((zp + 1) << (2 * lvl)) - 1 AS z_hi
       |  FROM nodes
       |  WHERE NOT (x0 > bx1 OR x0 + (CAST(1 AS BIGINT) << lvl) - 1 < bx0
       |          OR y0 > by1 OR y0 + (CAST(1 AS BIGINT) << lvl) - 1 < by0)
       |    AND ((x0 >= bx0 AND x0 + (CAST(1 AS BIGINT) << lvl) - 1 <= bx1
       |      AND y0 >= by0 AND y0 + (CAST(1 AS BIGINT) << lvl) - 1 <= by1)
       |      OR lvl = $ZrLmin)
       |), brk AS (
       |  SELECT flag, z_lo, z_hi,
       |    CASE WHEN z_lo = LAG(z_hi) OVER (PARTITION BY flag ORDER BY z_lo) + 1
       |      THEN 0 ELSE 1 END AS b
       |  FROM emitted
       |), grp AS (
       |  SELECT flag, z_lo, z_hi,
       |    SUM(b) OVER (PARTITION BY flag ORDER BY z_lo
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
       |  FROM brk
       |), fin AS (
       |  SELECT flag, CAST(MIN(z_lo) AS BIGINT) AS z_lo,
       |    CAST(MAX(z_hi) AS BIGINT) AS z_hi
       |  FROM grp GROUP BY flag, g
       |)
       |SELECT flag,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY flag ORDER BY z_lo) AS BIGINT) AS rk,
       |  z_lo, z_hi, z_hi - z_lo + 1 AS n_cells
       |FROM fin ORDER BY flag, rk""".stripMargin

  // ---------------------------------------------------------------- A31
  /** A31: incremental cluster-id continuation — the reference's per-batch
    * mode (run_inference.py:21-41 clusters only unclustered tiles,
    * solardb.py:245-252 continues ids from the DB sequence), driven on
    * the testdata by a score split: the high-confidence cells
    * (score ≥ 0.9) are the already-persisted batch, relabeled to the
    * reference's sequential ids (dense rank of the min-packed-id label —
    * the window runs over DISTINCT cluster labels, not cells), and the
    * remaining positives (0.8 ≤ score < 0.9) arrive as the new batch.
    * Semantics + scale notes in [[Clustering.incrementalClusters]].
    */
  val IncrementalSplit = 0.9
  def a31IncrementalCluster(spark: SparkSession, dir: String): DataFrame = {
    val pos = GeoDerive.positives(spark, dir)
    val cc1 = Clustering.connectedComponents4(
      pos.filter(col("score") >= IncrementalSplit))
      .withColumnRenamed("cluster_id", "tmp")
    val seq = cc1.select("tmp").distinct()
      .withColumn("sid", dense_rank().over(Window.orderBy("tmp")).cast("long"))
    val existing = cc1.join(seq, Seq("tmp"))
      .select(col("x"), col("y"), col("sid").as("cluster_id"))
    val batch2 = pos.filter(col("score") < IncrementalSplit).select("x", "y")
    Clustering.incrementalClusters(existing, batch2).orderBy("x", "y")
  }

  /** DuckDB twin: two recursive component CTEs (batch-1 and batch-2 cells
    * never overlap, so the label algebra composes exactly), then the same
    * adopt/fresh arithmetic. Helper CTEs referenced from inside a
    * recursion are MATERIALIZED (re-evaluated per iteration otherwise).
    */
  val a31Sql: String = withCtes(true, GeoDerive.cellsCte, GeoDerive.positivesCte,
    s"""ids1 AS MATERIALIZED (
       |  SELECT x, y, x * ${Clustering.IdShift} + y AS id FROM pos WHERE score >= $IncrementalSplit),
       |edge1 AS MATERIALIZED (
       |  SELECT a.id AS src, b.id AS dst FROM ids1 a JOIN ids1 b
       |  ON (abs(a.x - b.x) + abs(a.y - b.y)) = 1),
       |reach1(id, lbl) AS (
       |  SELECT id, id FROM ids1
       |  UNION
       |  SELECT e.dst, r.lbl FROM reach1 r JOIN edge1 e ON e.src = r.id),
       |cc1 AS MATERIALIZED (
       |  SELECT i.x, i.y, m.tmp FROM ids1 i
       |  JOIN (SELECT id, MIN(lbl) AS tmp FROM reach1 GROUP BY id) m ON i.id = m.id),
       |seq AS (
       |  SELECT tmp, CAST(dense_rank() OVER (ORDER BY tmp) AS BIGINT) AS sid
       |  FROM (SELECT DISTINCT tmp FROM cc1)),
       |existing AS MATERIALIZED (
       |  SELECT c.x, c.y, s.sid AS cluster_id FROM cc1 c JOIN seq s USING (tmp)),
       |ids2 AS MATERIALIZED (
       |  SELECT x, y, x * ${Clustering.IdShift} + y AS id FROM pos WHERE score < $IncrementalSplit),
       |edge2 AS MATERIALIZED (
       |  SELECT a.id AS src, b.id AS dst FROM ids2 a JOIN ids2 b
       |  ON (abs(a.x - b.x) + abs(a.y - b.y)) = 1),
       |reach2(id, lbl) AS (
       |  SELECT id, id FROM ids2
       |  UNION
       |  SELECT e.dst, r.lbl FROM reach2 r JOIN edge2 e ON e.src = r.id),
       |cc2 AS MATERIALIZED (
       |  SELECT i.x, i.y, m.tmp FROM ids2 i
       |  JOIN (SELECT id, MIN(lbl) AS tmp FROM reach2 GROUP BY id) m ON i.id = m.id),
       |adopt AS (
       |  SELECT c.tmp, MIN(e.cluster_id) AS adopt_id FROM cc2 c
       |  JOIN existing e ON (abs(c.x - e.x) + abs(c.y - e.y)) = 1
       |  GROUP BY c.tmp),
       |maxid AS (SELECT COALESCE(MAX(cluster_id), 0) AS max_id FROM existing),
       |fresh AS (
       |  SELECT tmp, CAST(dense_rank() OVER (ORDER BY tmp) AS BIGINT) AS rk
       |  FROM (SELECT DISTINCT tmp FROM cc2
       |        WHERE tmp NOT IN (SELECT tmp FROM adopt))),
       |labeled2 AS (
       |  SELECT c.x, c.y,
       |    CAST(COALESCE(a.adopt_id, m.max_id + f.rk) AS BIGINT) AS cluster_id
       |  FROM cc2 c LEFT JOIN adopt a USING (tmp) LEFT JOIN fresh f USING (tmp)
       |  CROSS JOIN maxid m)""".stripMargin)(
    """SELECT x, y, cluster_id, 1 AS batch FROM existing
      |UNION ALL
      |SELECT x, y, cluster_id, 2 AS batch FROM labeled2
      |ORDER BY x, y""".stripMargin)

  // ---------------------------------------------------------------- A32
  /** A32: exact outline simplification stats — the reference simplifies
    * every polygon before use (`process_city_shapes.py:93-104`: convex
    * hull → Douglas-Peucker `simplify` → buffer); for the RECTILINEAR
    * tile-union outlines the exact equivalent of simplify(0) is
    * collinear-vertex elimination, and it needs no walk at all: a
    * boundary vertex is droppable iff exactly two boundary edges meet
    * there and they share an orientation (both horizontal or both
    * vertical). Pinch vertices (4 incident edges) are corners by
    * definition. Shape: explode each a15 boundary edge into its two
    * endpoints tagged H/V, ONE partial-agg groupBy per (cluster,
    * vertex), then a per-cluster rollup — two shuffles total, both on
    * keys that shrink with the aggregation. n_corners is the vertex
    * count of the simplified rings — the MapRoulette payload-size win
    * (a challenge line shrinks ~2× per straight boundary run).
    */
  def a32OutlineSimplify(spark: SparkSession, dir: String): DataFrame = {
    val e = a15ClusterOutline(spark, dir)
    val verts = e.select(col("cluster_id"),
        explode(array(struct(col("x1").as("vx"), col("y1").as("vy")),
          struct(col("x2").as("vx"), col("y2").as("vy")))).as("v"),
        (col("y1") === col("y2")).cast("long").as("h"))
      .select(col("cluster_id"), col("v.vx").as("vx"), col("v.vy").as("vy"), col("h"))
    val perVertex = verts.groupBy("cluster_id", "vx", "vy")
      .agg(count(lit(1)).as("n_inc"), sum(col("h")).as("n_h"))
    val droppable = (col("n_inc") === 2) && (col("n_h") === 2 || col("n_h") === 0)
    perVertex.groupBy("cluster_id")
      .agg(expr("CAST(sum(n_inc) div 2 AS BIGINT)").as("n_edges"),
        count(lit(1)).as("n_vertices"),
        sum(droppable.cast("long")).as("n_dropped"))
      .withColumn("n_corners", col("n_vertices") - col("n_dropped"))
      .orderBy("cluster_id")
  }

  val a32Sql: String = withCtes(true, GeoDerive.cellsCte, GeoDerive.positivesCte, Clustering.ccCte,
    """tedge AS (
      |  SELECT cluster_id, x AS x1, y AS y1, x + 1 AS x2, y AS y2 FROM cc
      |  UNION ALL
      |  SELECT cluster_id, x, y + 1, x + 1, y + 1 FROM cc
      |  UNION ALL
      |  SELECT cluster_id, x, y, x, y + 1 FROM cc
      |  UNION ALL
      |  SELECT cluster_id, x + 1, y, x + 1, y + 1 FROM cc
      |),
      |bedge AS (
      |  SELECT cluster_id, x1, y1, x2, y2 FROM tedge
      |  GROUP BY cluster_id, x1, y1, x2, y2 HAVING COUNT(*) = 1
      |),
      |verts AS (
      |  SELECT cluster_id, x1 AS vx, y1 AS vy, CAST(y1 = y2 AS BIGINT) AS h FROM bedge
      |  UNION ALL
      |  SELECT cluster_id, x2, y2, CAST(y1 = y2 AS BIGINT) FROM bedge
      |),
      |pv AS (
      |  SELECT cluster_id, vx, vy, COUNT(*) AS n_inc, CAST(SUM(h) AS BIGINT) AS n_h
      |  FROM verts GROUP BY 1, 2, 3
      |)""".stripMargin)(
    """SELECT cluster_id,
      |  CAST(SUM(n_inc) AS BIGINT) // 2 AS n_edges,
      |  COUNT(*) AS n_vertices,
      |  CAST(SUM(CASE WHEN n_inc = 2 AND (n_h = 2 OR n_h = 0) THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
      |  COUNT(*) - CAST(SUM(CASE WHEN n_inc = 2 AND (n_h = 2 OR n_h = 0) THEN 1 ELSE 0 END) AS BIGINT) AS n_corners
      |FROM pv GROUP BY cluster_id ORDER BY cluster_id""".stripMargin)

  // ---------------------------------------------------------------- A33
  /** A33: Hilbert-curve locality key for the a30 tile coordinates — the
    * clustered-layout sort key that strictly dominates the Morton
    * z-value for bbox pruning: the Hilbert curve advances in unit grid
    * steps only (no Z-curve quadrant jumps), so every contiguous key
    * range maps to ONE connected near-square region and each
    * range-partitioned file gets a tighter (x, y) bounding rectangle
    * than a30's z at the same file count. Semantics + engine-parity
    * notes in [[graft.scale.ZOrder.hilbertD]] (map-side HOF fold, all
    * nonnegative div/mod, zero shuffles at any scale). The DuckDB twin
    * iterates the identical recurrence as a recursive CTE — NOT
    * `list_reduce` with a struct accumulator, which DuckDB 1.0
    * evaluates against the partially-updated accumulator
    * (nondeterministically wrong; measured, not assumed). HilbertSpec
    * proves bijectivity and unit-step adjacency on a full grid, the
    * properties any botched reflection/swap breaks.
    */
  val HilbertBits = 12

  def a33Hilbert(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        ((col("l_orderkey") % lit(2097152L)) / lit(512L)).cast("long").as("qx"),
        (((col("l_partkey") * lit(104729L)) % lit(2097152L)) / lit(512L)).cast("long").as("qy"))
      .withColumn("h", graft.scale.ZOrder.hilbertD(col("qx"), col("qy"), HilbertBits))
      .orderBy("l_orderkey", "l_linenumber")

  val a33Sql: String =
    s"""WITH RECURSIVE src AS (
       |  SELECT l_orderkey, l_linenumber,
       |    (l_orderkey % 2097152) // 512 AS qx,
       |    ((l_partkey * 104729) % 2097152) // 512 AS qy
       |  FROM lineitem
       |), hil AS (
       |  SELECT l_orderkey, l_linenumber, qx, qy,
       |    qx AS hx, qy AS hy, CAST(0 AS BIGINT) AS hd,
       |    CAST($HilbertBits AS BIGINT) AS lvl
       |  FROM src
       |  UNION ALL
       |  SELECT l_orderkey, l_linenumber, qx, qy,
       |    CASE WHEN hy // s = 0
       |         THEN CASE WHEN hx // s = 1 THEN s - 1 - (hy % s) ELSE hy % s END
       |         ELSE hx % s END,
       |    CASE WHEN hy // s = 0
       |         THEN CASE WHEN hx // s = 1 THEN s - 1 - (hx % s) ELSE hx % s END
       |         ELSE hy % s END,
       |    hd + s * s * (CASE WHEN hx // s = 0 THEN hy // s ELSE 3 - hy // s END),
       |    lvl - 1
       |  FROM (SELECT *, CAST(1 AS BIGINT) << CAST(lvl - 1 AS INT) AS s
       |        FROM hil WHERE lvl > 0)
       |)
       |SELECT l_orderkey, l_linenumber, qx, qy, hd AS h
       |FROM hil WHERE lvl = 0
       |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------------- A34
  /** A34: nearest positive tile per OSM node within a bounded radius —
    * the conflation REVIEW queue next to a13's hard exclusion: a13
    * drops clusters that already contain an OSM node
    * (maproulette.py:76-83); a34 reports, for every OSM solar node, the
    * nearest detected positive tile within Chebyshev radius
    * [[NearRadius]] (argmin over (d², x, y) — deterministic), i.e. the
    * near-misses a mapper reviews when imports sit a tile or two off
    * the detection (GPS offset, imagery skew). Nodes with no positive
    * in the window produce no row — they're a1-covered unmatched
    * imports.
    *
    * Scale shape: a bounded (2R+1)² offset explode on the NODE side
    * (the small side — OSM solar imports are thousands, tiles
    * trillions) followed by ONE hash equi-join on the tile coordinate
    * and a map-side-combinable min(struct) argmin — never a distance
    * θ-join, never a cross product; the same "nearest neighbor as
    * bounded-ring equi-join" trick that keeps spatial conflation
    * relational at z21 worldwide. An rtree (the reference's in-memory
    * answer, maproulette.py:69-74) cannot distribute; this shuffles
    * O(nodes·(2R+1)²) fixed-width rows.
    */
  val NearRadius = 3

  def a34NearestPositive(spark: SparkSession, dir: String): DataFrame = {
    val nd = GeoDerive.nodes(spark, dir).select("nx", "ny").distinct()
    val cand = nd
      .withColumn("dx", explode(sequence(lit(-NearRadius), lit(NearRadius))))
      .withColumn("dy", explode(sequence(lit(-NearRadius), lit(NearRadius))))
      .select(col("nx"), col("ny"),
        (col("nx") + col("dx")).as("x"), (col("ny") + col("dy")).as("y"),
        (col("dx") * col("dx") + col("dy") * col("dy")).cast("long").as("d2"))
    cand.join(GeoDerive.positives(spark, dir).select("x", "y"), Seq("x", "y"))
      .groupBy("nx", "ny")
      .agg(min(struct(col("d2"), col("x"), col("y"))).as("sc"))
      .select(col("nx"), col("ny"), col("sc.d2").as("d2"),
        col("sc.x").as("best_x"), col("sc.y").as("best_y"))
      .orderBy("nx", "ny")
  }

  val a34Sql: String = withCtes(false, GeoDerive.cellsCte, GeoDerive.positivesCte,
    GeoDerive.nodesCte,
    s"""nd AS (SELECT DISTINCT nx, ny FROM nodes),
       |cand AS (
       |  SELECT nd.nx, nd.ny, nd.nx + dx AS x, nd.ny + dy AS y,
       |    CAST(dx*dx + dy*dy AS BIGINT) AS d2
       |  FROM nd, range(-$NearRadius, ${NearRadius + 1}) tx(dx),
       |       range(-$NearRadius, ${NearRadius + 1}) ty(dy)
       |),
       |m AS (
       |  SELECT c.nx, c.ny, min([c.d2, p.x, p.y]) AS sc
       |  FROM cand c JOIN pos p ON p.x = c.x AND p.y = c.y
       |  GROUP BY c.nx, c.ny
       |)""".stripMargin)(
    """SELECT nx, ny, sc[1] AS d2, sc[2] AS best_x, sc[3] AS best_y
      |FROM m ORDER BY nx, ny""".stripMargin)

  // ---------------------------------------------------------------- A35
  /** A35: geohash cell id for the §4 lon/lat points — the base-32 member
    * of the locality-key family (a26 quadkey = Morton as base-4 text,
    * a30 = Morton integer, a33 = Hilbert integer): the string key
    * external geo systems (Redis GEO, Elasticsearch, OSM tooling)
    * speak, used to bucket-join third-party point sets without
    * converting them to slippy tiles. 8 characters = 40 bits = 20 lon +
    * 20 lat interleaved MSB-first starting with lon; the fractional
    * lon/lat never appears — xi = k·2^20 div 36000 keeps the bit
    * extraction in exact BIGINT on both engines ([[a30Zorder]]'s
    * convention), the interleave is [[graft.scale.ZOrder.zValue]] with
    * lat on the even positions, and the digit lookup is a fixed 8-step
    * base-32 substring chain. Entirely map-side scan-stage math — zero
    * shuffles at any corpus size. GeohashSpec pins the classic ezs42
    * known-answer (Wikipedia's worked example) and digit-roundtrip
    * bijectivity over the whole sf0.001 corpus.
    */
  val GeohashAlphabet = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** The geohash columns over any frame carrying integer (k, m) with
    * lon = −180 + k/100, lat = −85 + m/100 (the §4 derivation); factored
    * so the spec can drive known lon/lat points through the same math.
    */
  private[tiles] def geohashCols(df: DataFrame): DataFrame =
    df
      .withColumn("xi", expr("(k * 1048576) div 36000"))
      .withColumn("yi", expr("((m + 500) * 1048576) div 18000"))
      .withColumn("g", graft.scale.ZOrder.zValue(col("yi"), col("xi"), 20))
      .withColumn("geohash", concat((0 until 8).map { j =>
        expr(s"substr('$GeohashAlphabet', cast((g div ${1L << (5 * (7 - j))}) % 32 + 1 as int), 1)")
      }: _*))

  def a35Geohash(spark: SparkSession, dir: String): DataFrame =
    geohashCols(Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        (col("l_orderkey") % 36000L).as("k"), (col("l_partkey") % 17000L).as("m")))
      .select("l_orderkey", "l_linenumber", "xi", "yi", "g", "geohash")
      .orderBy("l_orderkey", "l_linenumber")

  val a35Sql: String = {
    val chars = (0 until 8).map { j =>
      s"substring('$GeohashAlphabet', CAST((g // ${1L << (5 * (7 - j))}) % 32 + 1 AS INT), 1)"
    }.mkString(" || ")
    s"""WITH src AS (
       |  SELECT l_orderkey, l_linenumber,
       |    ((l_orderkey % 36000) * 1048576) // 36000 AS xi,
       |    (((l_partkey % 17000) + 500) * 1048576) // 18000 AS yi
       |  FROM lineitem
       |), gz AS (
       |  SELECT l_orderkey, l_linenumber, xi, yi,
       |    CAST(list_sum(list_transform(range(0, 20), i ->
       |      (((yi >> i) & 1) << (2*i)) + (((xi >> i) & 1) << (2*i + 1)))) AS BIGINT) AS g
       |  FROM src
       |)
       |SELECT l_orderkey, l_linenumber, xi, yi, g, $chars AS geohash
       |FROM gz ORDER BY l_orderkey, l_linenumber""".stripMargin
  }

  // ---------------------------------------------------------------- A36
  /** A36: quadtree-compressed mixed-zoom cover — the S2/H3 "covering"
    * idiom on the slippy grid: re-express each polygon's full z21 tile
    * set (a3's grid fill) as the MINIMAL mixed-zoom cell set where a
    * parent replaces its children iff ALL FOUR are present (applied two
    * levels: z20 quads, z19 super-quads). This is what a tile server /
    * spatial index stores instead of raw z21 enumerations — interiors
    * collapse 16:1, only the boundary stays fine. Scale shape: each
    * level is ONE partial-agg shuffle on the parent key (count = 4 ⇒
    * complete) and each emission an anti-join against the completed
    * level above — all equi-joins on (poly, parent); data shrinks ~4×
    * per level, the reverse of a27's pyramid fan-out. The spec
    * re-expands the cover to z21 and requires EXACTLY the a3 grid —
    * disjoint and complete by construction.
    */
  def a36MixedCover(spark: SparkSession, dir: String): DataFrame =
    mixedCoverOn(GridOps.fillPolygons(spark).select("poly", "x", "y"))

  /** The cover computation on ANY (poly, x, y) tile frame — ScaleSmoke
    * drives this same body on a 10M-tile slab to pin the 4×-per-level
    * reduction shape.
    */
  private[graft] def mixedCoverOn(g: DataFrame): DataFrame = {
    val p20 = g.groupBy(col("poly"), expr("x div 2").as("px"), expr("y div 2").as("py"))
      .agg(count(lit(1)).as("nc")).filter(col("nc") === 4L)
      .select("poly", "px", "py")
    val p19 = p20.groupBy(col("poly"), expr("px div 2").as("qx"), expr("py div 2").as("qy"))
      .agg(count(lit(1)).as("nc")).filter(col("nc") === 4L)
      .select("poly", "qx", "qy")
    val c19 = p19.select(col("poly"), lit(19L).as("zoom"),
      col("qx").as("cx"), col("qy").as("cy"), lit(16L).as("n_tiles"))
    val c20 = p20
      .withColumn("qx", expr("px div 2")).withColumn("qy", expr("py div 2"))
      .join(p19, Seq("poly", "qx", "qy"), "left_anti")
      .select(col("poly"), lit(20L).as("zoom"),
        col("px").as("cx"), col("py").as("cy"), lit(4L).as("n_tiles"))
    val c21 = g
      .withColumn("px", expr("x div 2")).withColumn("py", expr("y div 2"))
      .join(p20, Seq("poly", "px", "py"), "left_anti")
      .select(col("poly"), lit(21L).as("zoom"),
        col("x").as("cx"), col("y").as("cy"), lit(1L).as("n_tiles"))
    c19.union(c20).union(c21).orderBy("poly", "zoom", "cx", "cy")
  }

  val a36Sql: String = withCtes(false, Polygons.bboxCte, Polygons.edgesCte,
    Polygons.gridCte,
    """p20 AS (
      |  SELECT poly, x // 2 AS px, y // 2 AS py FROM grid
      |  GROUP BY 1, 2, 3 HAVING COUNT(*) = 4
      |),
      |p19 AS (
      |  SELECT poly, px // 2 AS qx, py // 2 AS qy FROM p20
      |  GROUP BY 1, 2, 3 HAVING COUNT(*) = 4
      |),
      |cov AS (
      |  SELECT poly, CAST(19 AS BIGINT) AS zoom, qx AS cx, qy AS cy,
      |    CAST(16 AS BIGINT) AS n_tiles FROM p19
      |  UNION ALL
      |  SELECT p.poly, 20, p.px, p.py, 4 FROM p20 p
      |  ANTI JOIN p19 q ON q.poly = p.poly AND q.qx = p.px // 2 AND q.qy = p.py // 2
      |  UNION ALL
      |  SELECT g.poly, 21, g.x, g.y, 1 FROM grid g
      |  ANTI JOIN p20 p ON p.poly = g.poly AND p.px = g.x // 2 AND p.py = g.y // 2
      |)""".stripMargin)(
    "SELECT poly, zoom, cx, cy, n_tiles FROM cov ORDER BY poly, zoom, cx, cy")

  // ---------------------------------------------------------------- A37
  /** A37: run-length-encoded grid coverage — the interval
    * representation of a tile set (per grid row: start column + run
    * length), the third storage layout next to a36's quadtree cover
    * and a30/a33's space-filling-curve ordering. This is what the
    * reference's per-tile SQLite rows (solardb.py slippy_tiles) become
    * when a coverage mask must ship to another system: a 97-wide solid
    * row is ONE (start, len) pair instead of 97 rows, and
    * interval-vs-interval overlap joins (b10's shape) replace
    * tile-vs-tile equi-joins.
    *
    * Gaps-and-islands, the b29 idiom on spatial data: island key =
    * x − row_number within the grid row, one agg per island. The only
    * window partitions by (poly, y) and is bounded by the grid WIDTH —
    * a value-domain bound (C22's argument): however many polygons a
    * 100 TB world holds, no task ever sorts more than one row's ≤W
    * cells. Runs-per-row then aggregate map-side. The spec re-expands
    * every run via sequence() and requires exactly the a3 grid back.
    */
  def a37TileRle(spark: SparkSession, dir: String): DataFrame =
    rleOn(GridOps.fillPolygons(spark).select("poly", "x", "y"))

  /** RLE body on ANY (poly, x, y) frame (ScaleSmoke drives it on a
    * synthetic slab).
    */
  private[graft] def rleOn(g: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("poly", "y").orderBy("x")
    g.withColumn("isl", col("x") - row_number().over(w))
      .groupBy("poly", "y", "isl")
      .agg(min("x").as("x_start"), count(lit(1)).as("run_len"))
      .select("poly", "y", "x_start", "run_len")
      .orderBy("poly", "y", "x_start")
  }

  val a37Sql: String = withCtes(false, Polygons.bboxCte, Polygons.edgesCte,
    Polygons.gridCte)(
    """SELECT poly, y, MIN(x) AS x_start, COUNT(*) AS run_len
      |FROM (SELECT poly, x, y,
      |        x - ROW_NUMBER() OVER (PARTITION BY poly, y ORDER BY x) AS isl
      |      FROM grid)
      |GROUP BY poly, y, isl
      |ORDER BY poly, y, x_start""".stripMargin)

  // ---------------------------------------------------------------- A38
  /** A38: snapshot diff after re-inference — when the model updates,
    * the reference re-scores the world (run_inference.py's loop with a
    * new checkpoint) and what operations actually needs is the DIFF:
    * which tiles entered the positive set (new review work), which
    * left it (retractions to un-publish), which persisted. Both
    * snapshots derive from the SAME lineitem scan — score v1 is §4's
    * hash score, v2 swaps the two mixing constants ("the updated
    * model": same marginals, decorrelated per-tile) — so the whole
    * diff is ONE map-side-combinable groupBy computing both MAX scores
    * per cell, a scan-stage CASE, and a filter. No join at all: the
    * full-outer-join shape a naive two-snapshot diff would shuffle
    * twice collapses into one agg because the snapshots share a
    * derivation — the pattern to reach for whenever "diff two
    * versions" really means "re-derive with two parameterizations".
    */
  def a38SnapshotDiff(spark: SparkSession, dir: String): DataFrame =
    diffOn(Tables(spark, dir, "lineitem")).orderBy("poly", "x", "y")

  /** The diff body on ANY lineitem-shaped frame — ONE definition shared
    * by the batch query and D25's live stream (the d13/d22/d24
    * shared-definition contract: batch and stream can never drift).
    * Streaming-legal by construction: a complete-mode (poly, x, y) agg
    * holding one fixed-size (max s1, max s2) record per TILE — state
    * bounded by the world grid however long the stream runs — then
    * scan-stage classification.
    */
  private[graft] def diffOn(lineitem: DataFrame): DataFrame = {
    val score2 =
      ((((col("l_orderkey") * lit(40503L)) + (col("l_partkey") * lit(2654435761L))) % 1000L)
        / lit(1000.0))
    lineitem
      .select((col("l_orderkey") % GeoDerive.W).as("x"),
        (col("l_partkey") % GeoDerive.H).as("y"),
        GeoDerive.scoreCol.as("s1"), score2.as("s2"))
      .withColumn("poly", ((col("x") * GeoDerive.H) + col("y")) % 5)
      .groupBy("poly", "x", "y")
      .agg(max("s1").as("s1"), max("s2").as("s2"))
      .withColumn("status",
        when(col("s1") >= GeoDerive.Threshold && col("s2") >= GeoDerive.Threshold, "kept")
          .when(col("s1") >= GeoDerive.Threshold, "removed")
          .when(col("s2") >= GeoDerive.Threshold, "added"))
      .filter(col("status").isNotNull)
      .select("poly", "x", "y", "status")
  }

  val a38Sql: String =
    s"""WITH snap AS (
       |  SELECT (((l_orderkey % 97) * 89 + (l_partkey % 89)) % 5) AS poly,
       |    (l_orderkey % 97) AS x, (l_partkey % 89) AS y,
       |    MAX((((l_orderkey * 2654435761) + (l_partkey * 40503)) % 1000) / 1000.0) AS s1,
       |    MAX((((l_orderkey * 40503) + (l_partkey * 2654435761)) % 1000) / 1000.0) AS s2
       |  FROM lineitem GROUP BY 1, 2, 3
       |)
       |SELECT poly, x, y,
       |  CASE WHEN s1 >= ${GeoDerive.Threshold} AND s2 >= ${GeoDerive.Threshold} THEN 'kept'
       |       WHEN s1 >= ${GeoDerive.Threshold} THEN 'removed'
       |       WHEN s2 >= ${GeoDerive.Threshold} THEN 'added' END AS status
       |FROM snap
       |WHERE s1 >= ${GeoDerive.Threshold} OR s2 >= ${GeoDerive.Threshold}
       |ORDER BY poly, x, y""".stripMargin

  // ---------------------------------------------------------------- A39
  /** A39: the conflation decision queue — the reference's actual end
    * product assembled into one table: per detected cluster, `mapped`
    * (an OSM node sits ON a member tile — a13's exclusion test,
    * maproulette.py:76-83), `review` (no exact hit but a node within
    * Chebyshev radius [[NearRadius]] — a34's near-miss band, the
    * import-offset case a human reviews), or `challenge` (nothing
    * nearby — goes to the MapRoulette challenge like a25's
    * FeatureCollection). One query a downstream tasking system can
    * consume directly, where the reference drives three separate
    * passes.
    *
    * Scale shape: composes the memoized component labeling with the
    * deduped node set; the exact test is ONE tile-coordinate hash
    * equi-join; the near test is a34's bounded (2R+1)² offset explode
    * on the NODE side then the same equi-join + cluster-keyed min
    * partial agg; the decision is a scan-stage CASE over two left
    * joins on the cluster key. Never a distance θ-join, nothing
    * rtree-shaped (maproulette.py:69-74 can't distribute; this
    * shuffles O(nodes·49) fixed-width rows at any scale).
    */
  def a39ConflationQueue(spark: SparkSession, dir: String): DataFrame = {
    val cc = Clustering.componentsFor(spark, dir)
    val nd = GeoDerive.nodes(spark, dir).select("nx", "ny").distinct()
    val exact = cc.join(nd, cc("x") === nd("nx") && cc("y") === nd("ny"))
      .select("cluster_id").distinct().withColumn("has_exact", lit(true))
    val near = nd
      .withColumn("dx", explode(sequence(lit(-NearRadius), lit(NearRadius))))
      .withColumn("dy", explode(sequence(lit(-NearRadius), lit(NearRadius))))
      .select((col("nx") + col("dx")).as("x"), (col("ny") + col("dy")).as("y"),
        (col("dx") * col("dx") + col("dy") * col("dy")).cast("long").as("d2"))
      .join(cc.select("cluster_id", "x", "y"), Seq("x", "y"))
      .groupBy("cluster_id").agg(min("d2").as("min_d2"))
    cc.groupBy("cluster_id").agg(count(lit(1)).as("n_tiles"))
      .join(exact, Seq("cluster_id"), "left")
      .join(near, Seq("cluster_id"), "left")
      .select(col("cluster_id"), col("n_tiles"),
        when(col("has_exact"), "mapped")
          .when(col("min_d2").isNotNull, "review")
          .otherwise("challenge").as("decision"),
        coalesce(col("min_d2"), lit(-1L)).as("min_d2"))
      .orderBy("cluster_id")
  }

  val a39Sql: String = withCtes(true, GeoDerive.cellsCte, GeoDerive.positivesCte,
    Clustering.ccCte, GeoDerive.nodesCte,
    s"""nd AS (SELECT DISTINCT nx, ny FROM nodes),
       |ex AS (SELECT DISTINCT c.cluster_id FROM cc c
       |       JOIN nd n ON c.x = n.nx AND c.y = n.ny),
       |nearc AS (
       |  SELECT c.cluster_id, MIN(CAST(dx*dx + dy*dy AS BIGINT)) AS min_d2
       |  FROM nd CROSS JOIN range(-$NearRadius, ${NearRadius + 1}) tx(dx)
       |       CROSS JOIN range(-$NearRadius, ${NearRadius + 1}) ty(dy)
       |  JOIN cc c ON c.x = nd.nx + dx AND c.y = nd.ny + dy
       |  GROUP BY c.cluster_id
       |),
       |st AS (SELECT cluster_id, COUNT(*) AS n_tiles FROM cc GROUP BY cluster_id)""".stripMargin)(
    """SELECT st.cluster_id, st.n_tiles,
      |  CASE WHEN ex.cluster_id IS NOT NULL THEN 'mapped'
      |       WHEN nearc.min_d2 IS NOT NULL THEN 'review'
      |       ELSE 'challenge' END AS decision,
      |  COALESCE(nearc.min_d2, -1) AS min_d2
      |FROM st LEFT JOIN ex USING (cluster_id) LEFT JOIN nearc USING (cluster_id)
      |ORDER BY cluster_id""".stripMargin)

  // ---------------------------------------------------------------- A40
  /** A40: positive-tile neighbor-degree histogram — for every positive
    * tile, how many of its 4-neighbors are also positive (0..4), rolled
    * into a degree histogram with per-degree mean score. This is the
    * morphology report read BEFORE choosing clustering / dilation
    * thresholds (a7/a9's knobs): degree-0 mass = isolated single-tile
    * detections (noise candidates the reference's min-cluster-size
    * filter drops), degree-4 mass = solid interiors (safe to
    * downsample), and the score gradient across degrees says whether
    * confidence correlates with contiguity. Scale shape: the degree
    * computation is the a9 dilation idiom inverted — the positive set
    * explodes into its 4 neighbor COORDINATES (map-side, bounded ×4)
    * and ONE tile-coordinate hash equi-join back against the positive
    * set counts hits; a left join + coalesce(0) keeps the isolated
    * tiles; the histogram is a ≤5-row agg. Never an rtree, never a
    * distance join.
    */
  def a40DegreeHistogram(spark: SparkSession, dir: String): DataFrame = {
    val p = GeoDerive.positives(spark, dir).select("x", "y", "score")
    val nbr = p.select(col("x"), col("y"),
        explode(array(
          struct(lit(1L).as("dx"), lit(0L).as("dy")),
          struct(lit(-1L).as("dx"), lit(0L).as("dy")),
          struct(lit(0L).as("dx"), lit(1L).as("dy")),
          struct(lit(0L).as("dx"), lit(-1L).as("dy")))).as("o"))
      .select((col("x") + col("o.dx")).as("nx"), (col("y") + col("o.dy")).as("ny"),
        col("x"), col("y"))
    val deg = nbr.join(p.select(col("x").as("nx"), col("y").as("ny")), Seq("nx", "ny"))
      .groupBy("x", "y").agg(count(lit(1)).as("degree"))
    // scores are k/1000 — aggregate the exact integer milli form so the
    // mean is order-independent (the "doubles never accumulate" rule)
    p.join(deg, Seq("x", "y"), "left")
      .select(round(col("score") * 1000, 0).cast("long").as("s_milli"),
        coalesce(col("degree"), lit(0L)).as("degree"))
      .groupBy("degree")
      .agg(count(lit(1)).as("n_tiles"),
        expr("sum(s_milli) * 1000 div count(1)").as("mean_score_micro"))
      .orderBy("degree")
  }

  val a40Sql: String = withCtes(false, GeoDerive.cellsCte, GeoDerive.positivesCte,
    """offs(dx, dy) AS (VALUES (1, 0), (-1, 0), (0, 1), (0, -1)),
      |deg AS (
      |  SELECT p.x, p.y, COUNT(*) AS degree
      |  FROM pos p CROSS JOIN offs o
      |  JOIN pos q ON q.x = p.x + o.dx AND q.y = p.y + o.dy
      |  GROUP BY p.x, p.y
      |)""".stripMargin)(
    """SELECT COALESCE(d.degree, 0) AS degree, COUNT(*) AS n_tiles,
      |  CAST(SUM(CAST(ROUND(p.score * 1000) AS BIGINT)) AS BIGINT) * 1000
      |    // COUNT(*) AS mean_score_micro
      |FROM pos p LEFT JOIN deg d ON d.x = p.x AND d.y = p.y
      |GROUP BY COALESCE(d.degree, 0)
      |ORDER BY degree""".stripMargin)

  // ---------------------------------------------------------------- A41
  /** A41: cluster shape statistics — per detected cluster the bbox
    * fill ratio (tiles / bbox area, exact ppm) and aspect ratio (long
    * side / short side, ppm): the shape prior that separates plausible
    * solar-farm detections (compact, fill → 1, aspect ~1-3) from
    * linear false positives (roads, canals: aspect >> 1, fill << 1)
    * BEFORE human review — the screening pass a25's challenge feed
    * would apply upstream. Composes the memoized component labeling
    * with ONE cluster-keyed partial agg (count + two min/max pairs in
    * a single pass); everything after is scan-stage integer
    * arithmetic on the cluster frame.
    */
  def a41ShapeStats(spark: SparkSession, dir: String): DataFrame =
    Clustering.componentsFor(spark, dir)
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_tiles"),
        min("x").as("minx"), max("x").as("maxx"),
        min("y").as("miny"), max("y").as("maxy"))
      .withColumn("w", col("maxx") - col("minx") + 1L)
      .withColumn("h", col("maxy") - col("miny") + 1L)
      .select(col("cluster_id"), col("n_tiles"), col("w"), col("h"),
        expr("n_tiles * 1000000 div (w * h)").as("fill_ppm"),
        expr("greatest(w, h) * 1000000 div least(w, h)").as("aspect_ppm"))
      .orderBy("cluster_id")

  val a41Sql: String = withCtes(true, GeoDerive.cellsCte, GeoDerive.positivesCte,
    Clustering.ccCte,
    """shape AS (
      |  SELECT cluster_id, COUNT(*) AS n_tiles,
      |    MAX(x) - MIN(x) + 1 AS w, MAX(y) - MIN(y) + 1 AS h
      |  FROM cc GROUP BY cluster_id
      |)""".stripMargin)(
    """SELECT cluster_id, n_tiles, w, h,
      |  n_tiles * 1000000 // (w * h) AS fill_ppm,
      |  greatest(w, h) * 1000000 // least(w, h) AS aspect_ppm
      |FROM shape ORDER BY cluster_id""".stripMargin)

  // ---------------------------------------------------------------- A42
  /** A42: 3×3 score smoothing — each cell's inference score replaced by
    * the mean over its 3×3 neighborhood (present cells only), then
    * re-thresholded: the image-processing denoise pass that suppresses
    * isolated single-tile false positives and fills single-tile holes
    * BEFORE clustering, the robust alternative to thresholding raw
    * per-tile scores (solardb.py:231 thresholds raw). Output = cells
    * whose smoothed score clears [[GeoDerive.Threshold]], with the
    * change class (kept / promoted / demoted vs the raw threshold) so
    * the operational effect is auditable. Exact integer mean: scores
    * aggregate in milli units, mean_micro = sum·1000 div n — no double
    * ever accumulates. Scale shape: the a9/a40 idiom — bounded ×9
    * offset explode on the cell side, ONE tile-coordinate hash
    * equi-join, one partial agg; never a windowed convolution over a
    * sorted grid.
    */
  def a42ScoreSmooth(spark: SparkSession, dir: String): DataFrame = {
    val cells = GeoDerive.cells(spark, dir)
      .groupBy("x", "y").agg(max("score").as("score"))
      .select(col("x"), col("y"),
        round(col("score") * 1000, 0).cast("long").as("s_milli"))
    val contrib = cells
      .withColumn("dx", explode(sequence(lit(-1L), lit(1L))))
      .withColumn("dy", explode(sequence(lit(-1L), lit(1L))))
      .select((col("x") + col("dx")).as("x"), (col("y") + col("dy")).as("y"),
        col("s_milli"))
    val smoothed = contrib.join(cells.select("x", "y"), Seq("x", "y"))
      .groupBy("x", "y")
      .agg(count(lit(1)).as("n_nbr"), sum("s_milli").as("sum_milli"))
      .withColumn("smooth_micro", expr("sum_milli * 1000 div n_nbr"))
    val t = math.round(GeoDerive.Threshold * 1e6)
    smoothed.join(cells, Seq("x", "y"))
      .withColumn("raw_pos", col("s_milli") * 1000L >= t)
      .withColumn("smooth_pos", col("smooth_micro") >= t)
      .filter(col("smooth_pos") || col("raw_pos"))
      .withColumn("change",
        when(col("raw_pos") && col("smooth_pos"), "kept")
          .when(col("smooth_pos"), "promoted")
          .otherwise("demoted"))
      .select("x", "y", "s_milli", "smooth_micro", "n_nbr", "change")
      .orderBy("x", "y")
  }

  val a42Sql: String = withCtes(false, GeoDerive.cellsCte,
    s"""cm AS (
       |  SELECT x, y, CAST(ROUND(MAX(score) * 1000) AS BIGINT) AS s_milli
       |  FROM cells GROUP BY x, y
       |),
       |sm AS (
       |  SELECT c.x, c.y, COUNT(*) AS n_nbr,
       |    CAST(SUM(n.s_milli) AS BIGINT) * 1000 // COUNT(*) AS smooth_micro
       |  FROM cm c
       |  CROSS JOIN range(-1, 2) tx(dx) CROSS JOIN range(-1, 2) ty(dy)
       |  JOIN cm n ON n.x = c.x + dx AND n.y = c.y + dy
       |  GROUP BY c.x, c.y
       |)""".stripMargin)(
    s"""SELECT s.x, s.y, c.s_milli, s.smooth_micro, s.n_nbr,
       |  CASE WHEN c.s_milli * 1000 >= ${math.round(GeoDerive.Threshold * 1e6)}
       |         AND s.smooth_micro >= ${math.round(GeoDerive.Threshold * 1e6)} THEN 'kept'
       |       WHEN s.smooth_micro >= ${math.round(GeoDerive.Threshold * 1e6)} THEN 'promoted'
       |       ELSE 'demoted' END AS change
       |FROM sm s JOIN cm c ON c.x = s.x AND c.y = s.y
       |WHERE s.smooth_micro >= ${math.round(GeoDerive.Threshold * 1e6)}
       |   OR c.s_milli * 1000 >= ${math.round(GeoDerive.Threshold * 1e6)}
       |ORDER BY s.x, s.y""".stripMargin)

  // ---------------------------------------------------------------- A44
  /** A44: polygon simplification — the reference's per-city
    * `simplify_polygon` (process_city_shapes.py:93-104: shapely
    * `convex_hull.simplify(tol).buffer(d)`), the one capability every
    * reference run executes per polygon. Re-expressed over the A28
    * lineitem-derived polygon corpus in exact integer cell units as ONE
    * `groupBy(shape_id)` + the native
    * [[graft.functions.SimplifyPolygonStats]] fold: the per-shape
    * vertex set is value-domain bounded (≤ 7 distinct vertices), so
    * hull + Douglas-Peucker + Minkowski buffer all happen inside one
    * scalar expression over the collected coordinate array — one
    * shuffle of narrow (shape_id, vx, vy) rows, zero checkpoints, no
    * join cascade. Semantics (strict-chain pairwise hull test, exact
    * squared DP comparison capped at [[DpLevels]] recursion levels with
    * a loud overflow failure, rectilinear buffer algebra) are documented
    * on the expression; the DuckDB oracle keeps the fully relational
    * unrolled-CTE derivation, so the two engines share no code path.
    *
    * Tolerance [[DpTol]] = 6 cells with [[BufD]] = 24 preserves the
    * reference's 1:4 simplify:buffer ratio (0.001° : 0.004°) at a scale
    * that exercises both DP branches on the 97-cell domain. Output per
    * non-degenerate shape (hull ≥ 3 vertices): hull size/area, kept
    * size/area, L1 perimeter, and the buffered area — all BIGINT.
    */
  val DpTol = 6L
  val BufD = 24L
  private val DpLevels = 5

  def a44SimplifyPolygon(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .select(col("l_orderkey").as("shape_id"),
        (col("l_partkey") % 97L).as("vx"),
        when(col("l_orderkey") % 7L === 0L, col("l_partkey") % 97L)
          .otherwise((col("l_partkey") * 31L) % 89L).as("vy"))
      .groupBy("shape_id")
      .agg(collect_list(struct(col("vx"), col("vy"))).as("verts"))
      .select(col("shape_id"),
        graft.functions.geo.simplify_polygon_stats(
          col("verts"), DpTol, BufD, DpLevels).as("st"))
      .filter(col("st.n_hull") >= 3)
      .select(col("shape_id"), col("st.n_hull").as("n_hull"),
        col("st.hull_area2").as("hull_area2"), col("st.n_kept").as("n_kept"),
        col("st.simp_area2").as("simp_area2"), col("st.l1_perim").as("l1_perim"),
        col("st.buf_area2").as("buf_area2"))
      .orderBy("shape_id")

  val a44Sql: String = {
    val tol2 = DpTol * DpTol
    val levels = (1 to DpLevels).map { k =>
      s"""cand$k AS (
         |  SELECT s.shape_id, s.chain, s.lo, s.hi, c.pos,
         |    abs((bb.vx - aa.vx) * (c.vy - aa.vy)
         |      - (bb.vy - aa.vy) * (c.vx - aa.vx)) AS cr,
         |    (bb.vx - aa.vx) * (bb.vx - aa.vx)
         |      + (bb.vy - aa.vy) * (bb.vy - aa.vy) AS len2
         |  FROM span${k - 1} s
         |  JOIN cpos aa ON aa.shape_id = s.shape_id AND aa.chain = s.chain AND aa.pos = s.lo
         |  JOIN cpos bb ON bb.shape_id = s.shape_id AND bb.chain = s.chain AND bb.pos = s.hi
         |  JOIN cpos c ON c.shape_id = s.shape_id AND c.chain = s.chain
         |    AND c.pos > s.lo AND c.pos < s.hi),
         |pick$k AS MATERIALIZED (
         |  SELECT shape_id, chain, lo, hi, pos FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY shape_id, chain, lo, hi
         |      ORDER BY cr DESC, pos) AS rk FROM cand$k)
         |  WHERE rk = 1 AND cr * cr > $tol2 * len2),
         |span$k AS (
         |  SELECT shape_id, chain, lo, pos AS hi FROM pick$k WHERE pos - lo >= 2
         |  UNION ALL
         |  SELECT shape_id, chain, pos AS lo, hi FROM pick$k WHERE hi - pos >= 2)"""
        .stripMargin
    }
    def ringSql(src: String, name: String): String =
      s"""ringv_$name AS (
         |  SELECT shape_id, 0 AS grp, pos AS ord, vx, vy FROM $src WHERE chain = 'L'
         |  UNION ALL
         |  SELECT shape_id, 1, -pos, vx, vy FROM $src
         |  WHERE chain = 'U' AND pos > 0 AND pos < m - 1),
         |closed_$name AS (
         |  SELECT shape_id, vx, vy,
         |    COALESCE(LEAD(vx) OVER w, FIRST_VALUE(vx) OVER w) AS nx,
         |    COALESCE(LEAD(vy) OVER w, FIRST_VALUE(vy) OVER w) AS ny
         |  FROM ringv_$name
         |  WINDOW w AS (PARTITION BY shape_id ORDER BY grp, ord
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)),
         |stat_$name AS (
         |  SELECT shape_id, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(abs(SUM(vx * ny - nx * vy)) AS BIGINT) AS area2,
         |    CAST(SUM(abs(nx - vx) + abs(ny - vy)) AS BIGINT) AS l1
         |  FROM closed_$name GROUP BY shape_id)""".stripMargin
    withCtes(false,
      s"""averts AS MATERIALIZED (
         |  SELECT DISTINCT l_orderkey AS shape_id, l_partkey % 97 AS vx,
         |    CASE WHEN l_orderkey % 7 = 0 THEN l_partkey % 97
         |         ELSE (l_partkey * 31) % 89 END AS vy
         |  FROM lineitem)""".stripMargin,
      """tri AS (
        |  SELECT p.shape_id, p.vx, p.vy,
        |    (b.vx - a.vx) * (p.vy - a.vy) - (b.vy - a.vy) * (p.vx - a.vx) AS cr
        |  FROM averts p
        |  JOIN averts a ON a.shape_id = p.shape_id
        |    AND (a.vx < p.vx OR (a.vx = p.vx AND a.vy < p.vy))
        |  JOIN averts b ON b.shape_id = p.shape_id
        |    AND (p.vx < b.vx OR (p.vx = b.vx AND p.vy < b.vy)))""".stripMargin,
      """flags AS (
        |  SELECT shape_id, vx, vy,
        |    MAX(CASE WHEN cr >= 0 THEN 1 ELSE 0 END) AS nl,
        |    MAX(CASE WHEN cr <= 0 THEN 1 ELSE 0 END) AS nu
        |  FROM tri GROUP BY shape_id, vx, vy)""".stripMargin,
      """chain AS (
        |  SELECT v.shape_id, 'L' AS chain, v.vx, v.vy
        |  FROM averts v LEFT JOIN flags f USING (shape_id, vx, vy)
        |  WHERE COALESCE(f.nl, 0) = 0
        |  UNION ALL
        |  SELECT v.shape_id, 'U', v.vx, v.vy
        |  FROM averts v LEFT JOIN flags f USING (shape_id, vx, vy)
        |  WHERE COALESCE(f.nu, 0) = 0)""".stripMargin,
      """cpos AS MATERIALIZED (
        |  SELECT shape_id, chain, vx, vy,
        |    ROW_NUMBER() OVER (PARTITION BY shape_id, chain ORDER BY vx, vy) - 1 AS pos,
        |    COUNT(*) OVER (PARTITION BY shape_id, chain) AS m
        |  FROM chain)""".stripMargin,
      """span0 AS (
        |  SELECT shape_id, chain, 0 AS lo, m - 1 AS hi
        |  FROM cpos WHERE pos = 0 AND m >= 3)""".stripMargin,
      (levels :+
        s"""kept AS (
           |  SELECT shape_id, chain, pos FROM cpos WHERE pos = 0 OR pos = m - 1
           |${(1 to DpLevels).map(k => s"  UNION ALL SELECT shape_id, chain, pos FROM pick$k").mkString("\n")}),
           |keptv AS (
           |  SELECT k.shape_id, k.chain, k.pos, c.vx, c.vy, c.m
           |  FROM kept k JOIN cpos c USING (shape_id, chain, pos))""".stripMargin)
        .mkString(",\n"),
      ringSql("cpos", "h"),
      ringSql("keptv", "s"))(
      s"""SELECT h.shape_id, h.n AS n_hull, h.area2 AS hull_area2,
         |  s.n AS n_kept, s.area2 AS simp_area2, s.l1 AS l1_perim,
         |  CAST(s.area2 + ${2L * BufD} * s.l1 + ${8L * BufD * BufD} AS BIGINT) AS buf_area2
         |FROM stat_h h JOIN stat_s s USING (shape_id)
         |WHERE h.n >= 3
         |ORDER BY shape_id""".stripMargin)
  }

  // ---------------------------------------------------------------- A45
  /** A45: combined polygon coverage (combine_all_polygons,
    * process_city_shapes.py:80-90): the reference unions every city
    * polygon into one GeometryCollection before its inner-grid pass. At
    * tile granularity the union is ONE partial-aggregated groupBy over
    * the per-polygon grid fills, and it keeps what the reference's
    * geometric union silently merges: per-tile provenance — which
    * polygons claim each tile and how many. Map-side combinable on
    * (x, y); the claimant list is bounded by the polygon dim (≤ 5), so
    * no per-key state growth at any grid size.
    */
  def a45PolygonUnion(spark: SparkSession, dir: String): DataFrame =
    GridOps.fillPolygons(spark)
      .groupBy("x", "y")
      .agg(count(lit(1)).as("n_claims"),
        array_join(transform(array_sort(collect_list(col("poly"))),
          p => p.cast("string")), ",").as("claimants"))
      .orderBy("x", "y")

  val a45Sql: String = withCtes(false, Polygons.bboxCte, Polygons.edgesCte,
    Polygons.gridCte)(
    """SELECT x, y, CAST(COUNT(*) AS BIGINT) AS n_claims,
      |  string_agg(CAST(poly AS VARCHAR), ',' ORDER BY poly) AS claimants
      |FROM grid GROUP BY x, y ORDER BY x, y""".stripMargin)

  // ---------------------------------------------------------------- A46
  /** A46: pairwise polygon overlap matrix — the intersection companion
    * to A45's union, completing the boolean-op family (A13/A20 are
    * containment): for every polygon PAIR that shares at least one
    * tile, the shared-tile count and the exact Jaccard overlap in ppm —
    * the conflation diagnostic the reference's per-city loop never
    * surfaces (two overlapping city shapes double-count their shared
    * grid in `combine_all_polygons`, process_city_shapes.py:80-90; the
    * matrix says by how much). ONE self equi-join of the grid fill on
    * (x, y) — tile keys are high-cardinality, so no skew surface — a
    * pair-keyed partial agg bounded by the polygon-pair dim (≤ 10
    * pairs), and a broadcast of the per-polygon sizes. |A∪B| derives as
    * |A|+|B|−|A∩B| (inclusion-exclusion over exact tile counts).
    */
  def a46OverlapMatrix(spark: SparkSession, dir: String): DataFrame = {
    val g = GridOps.fillPolygons(spark)
    val shared = g
      .join(g.select(col("poly").as("poly_b"), col("x"), col("y")), Seq("x", "y"))
      .filter(col("poly") < col("poly_b"))
      .groupBy(col("poly").as("poly_a"), col("poly_b"))
      .agg(count(lit(1)).as("n_shared"))
    val sizes = g.groupBy("poly").agg(count(lit(1)).as("n"))
    shared
      .join(broadcast(sizes.select(col("poly").as("poly_a"), col("n").as("n_a"))), "poly_a")
      .join(broadcast(sizes.select(col("poly").as("poly_b"), col("n").as("n_b"))), "poly_b")
      .select(col("poly_a"), col("poly_b"), col("n_a"), col("n_b"), col("n_shared"),
        expr("(n_shared * 1000000) div (n_a + n_b - n_shared)").as("jaccard_ppm"))
      .orderBy("poly_a", "poly_b")
  }

  val a46Sql: String = withCtes(false, Polygons.bboxCte, Polygons.edgesCte,
    Polygons.gridCte,
    "sz AS (SELECT poly, CAST(COUNT(*) AS BIGINT) AS n FROM grid GROUP BY poly)",
    """sh AS (
      |  SELECT a.poly AS poly_a, b.poly AS poly_b, CAST(COUNT(*) AS BIGINT) AS n_shared
      |  FROM grid a JOIN grid b ON b.x = a.x AND b.y = a.y AND a.poly < b.poly
      |  GROUP BY a.poly, b.poly)""".stripMargin)(
    """SELECT sh.poly_a, sh.poly_b, sa.n AS n_a, sb.n AS n_b, sh.n_shared,
      |  (sh.n_shared * 1000000) // (sa.n + sb.n - sh.n_shared) AS jaccard_ppm
      |FROM sh JOIN sz sa ON sa.poly = sh.poly_a JOIN sz sb ON sb.poly = sh.poly_b
      |ORDER BY sh.poly_a, sh.poly_b""".stripMargin)

  /** All A-block entries for SparkEntry. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a44_simplify_polygon" -> (a44SimplifyPolygon _),
    "a45_polygon_union" -> (a45PolygonUnion _),
    "a46_overlap_matrix" -> (a46OverlapMatrix _),
    "a42_score_smooth" -> (a42ScoreSmooth _),
    "a43_zrange_plan" -> (a43ZrangePlan _),
    "a41_shape_stats" -> (a41ShapeStats _),
    "a40_degree_histogram" -> (a40DegreeHistogram _),
    "a39_conflation_queue" -> (a39ConflationQueue _),
    "a38_snapshot_diff" -> (a38SnapshotDiff _),
    "a37_tile_rle" -> (a37TileRle _),
    "a36_mixed_cover" -> (a36MixedCover _),
    "a35_geohash" -> (a35Geohash _),
    "a34_nearest_positive" -> (a34NearestPositive _),
    "a21_tile_batch" -> (a21TileBatch _),
    "a22_unclustered_threshold" -> (a22UnclusteredThreshold _),
    "a23_slice_plan" -> (a23SlicePlan _),
    "a24_tile_source" -> (a24TileSource _),
    // the challenge row is checked through its integer face (ring count
    // + document length + token fingerprint) — the raw GeoJSON string
    // itself is written by Pipeline and proven by PipelineSpec
    "a25_clustered_challenge" -> (a25ChallengeChecked _),
    "a25_ring_stats" -> (a25RingStats _),
    "a25_geojson_fp" -> (a25GeojsonFingerprint _),
    "a28_degenerate_polygons" -> (a28DegeneratePolygons _),
    "a29_upsample_slice" -> (a29UpsampleSlice _),
    "a30_zorder" -> (a30Zorder _),
    "a31_incremental_cluster" -> (a31IncrementalCluster _),
    "a32_outline_simplify" -> (a32OutlineSimplify _),
    "a33_hilbert" -> (a33Hilbert _),
    "a26_quadkey" -> (a26Quadkey _),
    "a27_pyramid" -> (a27Pyramid _),
    "a20_polygons_with_grid" -> (a20PolygonsWithGrid _),
    "a1_deg2num" -> (a1Deg2num _),
    "a2_num2deg" -> (a2Num2deg _),
    "a3_grid_fill" -> (a3GridFill _),
    "a4_centroid_distance" -> (a4CentroidDistance _),
    "a5_inference_order" -> (a5InferenceOrder _),
    "a6_threshold_rank" -> (a6ThresholdRank _),
    "a7_grid_cluster" -> (a7GridCluster _),
    "a8_largest_clusters" -> (a8LargestClusters _),
    "a9_dilate3x3" -> (a9Dilate _),
    "a10_imagery_cleanup" -> (a10ImageryCleanup _),
    "a11_mark_imagery" -> (a11MarkImagery _),
    "a12_osm_dedup" -> (a12OsmDedup _),
    "a13_spatial_antijoin" -> (a13SpatialAntijoin _),
    "a14_tile_geojson" -> (a14TileGeojson _),
    "a15_cluster_outline" -> (a15ClusterOutline _),
    "a16_polygon_area" -> (a16PolygonArea _),
    "a17_upsert_ignore" -> (a17UpsertIgnore _),
    "a18_stitch_plan" -> (a18StitchPlan _),
    "a19_inference_scored" -> (a19InferenceScored _))

  val oracles: Map[String, String] = Map(
    "a44_simplify_polygon" -> a44Sql,
    "a45_polygon_union" -> a45Sql,
    "a46_overlap_matrix" -> a46Sql,
    "a42_score_smooth" -> a42Sql,
    "a43_zrange_plan" -> a43Sql,
    "a41_shape_stats" -> a41Sql,
    "a40_degree_histogram" -> a40Sql,
    "a39_conflation_queue" -> a39Sql,
    "a38_snapshot_diff" -> a38Sql,
    "a37_tile_rle" -> a37Sql,
    "a36_mixed_cover" -> a36Sql,
    "a35_geohash" -> a35Sql,
    "a34_nearest_positive" -> a34Sql,
    "a21_tile_batch" -> a21Sql,
    "a22_unclustered_threshold" -> a22Sql,
    "a23_slice_plan" -> a23Sql,
    "a24_tile_source" -> a24Sql,
    "a25_ring_stats" -> a25RingStatsSql,
    "a25_geojson_fp" -> a25GeojsonFpSql,
    "a25_clustered_challenge" -> a25CheckedSql,
    "a28_degenerate_polygons" -> a28Sql,
    "a29_upsample_slice" -> a29Sql,
    "a30_zorder" -> a30Sql,
    "a31_incremental_cluster" -> a31Sql,
    "a32_outline_simplify" -> a32Sql,
    "a33_hilbert" -> a33Sql,
    "a26_quadkey" -> a26Sql,
    "a27_pyramid" -> a27Sql,
    "a20_polygons_with_grid" -> a20Sql,
    "a1_deg2num" -> a1Sql,
    "a2_num2deg" -> a2Sql,
    "a3_grid_fill" -> a3Sql,
    "a4_centroid_distance" -> a4Sql,
    "a5_inference_order" -> a5Sql,
    "a6_threshold_rank" -> a6Sql,
    "a7_grid_cluster" -> a7Sql,
    "a8_largest_clusters" -> a8Sql,
    "a9_dilate3x3" -> a9Sql,
    "a10_imagery_cleanup" -> a10Sql,
    "a11_mark_imagery" -> a11Sql,
    "a12_osm_dedup" -> a12Sql,
    "a13_spatial_antijoin" -> a13Sql,
    "a14_tile_geojson" -> a14Sql,
    "a15_cluster_outline" -> a15Sql,
    "a16_polygon_area" -> a16Sql,
    "a17_upsert_ignore" -> a17Sql,
    "a18_stitch_plan" -> a18Sql,
    "a19_inference_scored" -> a19Sql)
}
