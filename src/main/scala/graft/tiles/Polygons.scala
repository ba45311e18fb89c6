package graft.tiles

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The search-polygon dimension (reference: search_polygons,
  * solardb.py:16-23, loaded from city GeoJSON). Five convex CCW polygons
  * in cell space, single source of truth for both the Spark DataFrame and
  * the DuckDB oracle CTE text.
  *
  * A point is inside iff every edge cross-product
  * `(x2-x1)(py-y1) - (y2-y1)(px-x1) >= 0` (CCW half-plane test) — exact
  * integer math on both engines.
  */
object Polygons {
  /** poly id → CCW vertices (validated convex, positive area). */
  val vertices: Seq[(Long, Seq[(Long, Long)])] = Seq(
    0L -> Seq((20L, 2L), (38L, 20L), (20L, 38L), (2L, 20L)),
    1L -> Seq((45L, 5L), (75L, 5L), (75L, 35L), (45L, 35L)),
    2L -> Seq((5L, 45L), (35L, 45L), (20L, 85L)),
    3L -> Seq((50L, 45L), (90L, 50L), (85L, 80L), (55L, 75L)),
    4L -> Seq((2L, 40L), (90L, 2L), (94L, 10L), (6L, 48L)))

  case class Edge(ex1: Long, ey1: Long, ex2: Long, ey2: Long)
  case class Poly(poly: Long, minx: Long, maxx: Long, miny: Long, maxy: Long, edges: Seq[Edge])

  val polys: Seq[Poly] = vertices.map { case (id, vs) =>
    val es = vs.indices.map { i =>
      val (x1, y1) = vs(i); val (x2, y2) = vs((i + 1) % vs.size)
      Edge(x1, y1, x2, y2)
    }
    Poly(id, vs.map(_._1).min, vs.map(_._1).max, vs.map(_._2).min, vs.map(_._2).max, es)
  }

  /** Polygon dim as a DataFrame (bbox + edge array) — tiny, always
    * broadcast; the edge array keeps the inside-test a map-side `forall`.
    */
  def df(spark: SparkSession): DataFrame = {
    import spark.implicits._
    polys.toDF()
  }

  /** `bbox(poly, minx, maxx, miny, maxy)` VALUES CTE. */
  val bboxCte: String = {
    val rows = polys.map(p => s"(${p.poly}, ${p.minx}, ${p.maxx}, ${p.miny}, ${p.maxy})")
    s"bbox(poly, minx, maxx, miny, maxy) AS (VALUES ${rows.mkString(", ")})"
  }

  /** `edges(poly, ex1, ey1, ex2, ey2)` VALUES CTE. */
  val edgesCte: String = {
    val rows = for (p <- polys; e <- p.edges)
      yield s"(${p.poly}, ${e.ex1}, ${e.ey1}, ${e.ex2}, ${e.ey2})"
    s"edges(poly, ex1, ey1, ex2, ey2) AS (VALUES ${rows.mkString(", ")})"
  }

  /** Grid-fill CTE: all integer cells inside each polygon (SQL twin of
    * GridOps.fillPolygons).
    */
  val gridCte: String =
    """gx AS (SELECT poly, UNNEST(range(minx, maxx + 1)) AS x, miny, maxy FROM bbox),
      |gxy AS (SELECT poly, x, UNNEST(range(miny, maxy + 1)) AS y FROM gx),
      |grid AS (
      |  SELECT g.poly, g.x, g.y
      |  FROM gxy g JOIN edges e USING (poly)
      |  GROUP BY g.poly, g.x, g.y
      |  HAVING MIN((e.ex2 - e.ex1) * (g.y - e.ey1) - (e.ey2 - e.ey1) * (g.x - e.ex1)) >= 0
      |)""".stripMargin

  /** Discrete-centroid CTE (SQL twin of GridOps.centroids). */
  val centroidsCte: String =
    """cent AS (
      |  SELECT poly, CAST(SUM(x) AS DOUBLE) / COUNT(*) AS cx,
      |         CAST(SUM(y) AS DOUBLE) / COUNT(*) AS cy
      |  FROM grid GROUP BY poly
      |)""".stripMargin
}
