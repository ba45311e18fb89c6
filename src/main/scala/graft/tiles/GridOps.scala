package graft.tiles

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed grid operators mirroring the reference's polygon/tile
  * machinery (process_city_shapes.py, solardb.py, run_inference.py).
  *
  * Scale notes (SURVEY.md §6): the polygon dim is always broadcast; grids
  * are generated distributed via `sequence`+`explode` with a repartition
  * between the two explodes so one polygon's bbox fans out across
  * executors instead of living in a single task (at z21 a city bbox is
  * millions of tiles); the inside-test is a map-side `forall` over the
  * broadcast edge array — no shuffle.
  */
object GridOps {

  /** Edge cross product (x2−x1)(y−y1) − (y2−y1)(x−x1): zero ⇔ the point
    * is on the edge's carrier line.
    */
  private def cross(e: Column, x: Column, y: Column): Column =
    (e("ex2") - e("ex1")) * (y - e("ey1")) - (e("ey2") - e("ey1")) * (x - e("ex1"))

  /** Point on the edge segment: collinear AND within the segment bbox —
    * exact integer math.
    */
  private def onEdge(e: Column, x: Column, y: Column): Column =
    cross(e, x, y) === 0 &&
      x.between(least(e("ex1"), e("ex2")), greatest(e("ex1"), e("ex2"))) &&
      y.between(least(e("ey1"), e("ey2")), greatest(e("ey1"), e("ey2")))

  /** The edge strictly crosses the +x ray from (x, y): spans y (strict
    * `>` convention handles ray-through-vertex consistently) and the
    * crossing lies right of the point. `px < x1 + (y−y1)(x2−x1)/(y2−y1)`
    * cross-multiplied by (y2−y1) to stay in exact integers: cross > 0
    * when the edge ascends, cross < 0 when it descends.
    */
  private def crossesRay(e: Column, x: Column, y: Column): Column =
    ((e("ey1") > y) =!= (e("ey2") > y)) &&
      when(e("ey2") > e("ey1"), cross(e, x, y) > 0).otherwise(cross(e, x, y) < 0)

  /** Ray-cast containment over an edge array (boundary counts as
    * inside): works for ANY simple polygon, concave included — the
    * reference's `shapely.contains`-equivalent
    * (process_city_shapes.py:146-171) without the convexity assumption a
    * half-plane test needs. Map-side HOFs over the broadcast edge array;
    * exact integer math throughout, so Spark and the DuckDB twin can
    * never disagree on a boundary cell.
    */
  def containsPoint(edges: Column, x: Column, y: Column): Column =
    exists(edges, e => onEdge(e, x, y)) ||
      size(filter(edges, e => crossesRay(e, x, y))) % 2 === 1

  /** All integer cells inside each polygon (reference
    * get_coords_inside_polygon, process_city_shapes.py:146-171: meshgrid
    * over bbox + containment mask — here the meshgrid is distributed).
    * For the convex CCW polygons of the oracle world this agrees exactly
    * with the half-plane `MIN(cross) >= 0` test the DuckDB twin runs
    * (interior: winding parity 1; boundary: onEdge ⇔ some cross = 0 with
    * the rest ≥ 0).
    */
  def fillPolygons(spark: SparkSession): DataFrame = {
    // no broadcast() hint: the dim is exploded in place, not joined —
    // a dangling hint here is what HintErrorLogger warned about
    val p = Polygons.df(spark)
    p.withColumn("x", explode(sequence(col("minx"), col("maxx"))))
      .repartition(col("poly"), col("x"))
      .withColumn("y", explode(sequence(col("miny"), col("maxy"))))
      .filter(containsPoint(col("edges"), col("x"), col("y")))
      .select(col("poly"), col("x"), col("y"))
  }

  /** Discrete centroid per polygon from the filled grid — exact integer
    * sums, one double division (oracle-stable).
    */
  def centroids(spark: SparkSession): DataFrame =
    fillPolygons(spark).groupBy("poly")
      .agg(
        (sum("x").cast("double") / count(lit(1))).as("cx"),
        (sum("y").cast("double") / count(lit(1))).as("cy"))

  /** Tile→centroid distance (reference compute_centroid_distances,
    * solardb.py:121-134) — centroid dim broadcast onto the cell fact.
    */
  def centroidDistance(cells: DataFrame, centroids: DataFrame): DataFrame = {
    val d = sqrt((col("x") - col("cx")) * (col("x") - col("cx"))
      + (col("y") - col("cy")) * (col("y") - col("cy")))
    cells.join(broadcast(centroids), "poly")
      .withColumn("centroid_distance", round(d, 6))
      .drop("cx", "cy")
  }

  /** 3×3 dilation of a cell set (reference run_inference.py:68-72:
    * expanded_coords_above_threshold). Map-side explode then one distinct
    * shuffle.
    */
  def dilate3x3(cells: DataFrame): DataFrame = {
    val offs = array((-1 to 1).flatMap(dx => (-1 to 1).map(dy =>
      struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy")))): _*)
    cells.select(explode(offs).as("o"), col("x"), col("y"))
      .select((col("x") + col("o.dx")).as("x"), (col("y") + col("o.dy")).as("y"))
      .distinct()
  }

  val dilate3x3Cte: String =
    """dil AS (
      |  SELECT DISTINCT p.x + dx.d AS x, p.y + dy.d AS y
      |  FROM pos p, (VALUES (-1), (0), (1)) dx(d), (VALUES (-1), (0), (1)) dy(d)
      |)""".stripMargin

  /** Imagery-block math (imagery.py:146-157): top-left of the query grid a
    * cell belongs to, for `gridSize`-aligned download blocks.
    */
  def blockBase(c: Column, gridSize: Long): Column = c - (c % gridSize)
}
