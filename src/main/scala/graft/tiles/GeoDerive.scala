package graft.tiles

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.util.Seal._

/** Deterministic derivation of the reference's geo world (slippy tiles,
  * inference scores, OSM nodes) from the driver's TPC-H testdata
  * (SURVEY.md §4). All integer math so Spark and the DuckDB oracle agree
  * bit-for-bit; doubles appear only as a final exact division.
  *
  * The derived model mirrors solardb.py's tables:
  *   cells  ≈ slippy_tiles (row/column/zoom + panel_softmax)
  *   nodes  ≈ osm_solar_nodes (lon/lat points)
  */
object GeoDerive {
  /** Grid dims: 97×89 cell world (both prime, so orderkey/partkey wrap
    * fills the grid uniformly).
    */
  val W = 97L
  val H = 89L
  /** Positive-classification threshold (reference default 0.25,
    * solardb.py:231; ours is 0.8 because the synthetic score is uniform).
    */
  val Threshold = 0.8

  def scoreCol: Column =
    (((col("l_orderkey") * lit(2654435761L)) + (col("l_partkey") * lit(40503L))) % 1000) / lit(1000.0)

  /** The tile/"slippy_tiles" fact: one row per grid cell with max inference
    * score and observation weight. One shuffle (the groupBy); partial
    * aggregation makes it map-side combinable at scale.
    *
    * Memoized per session+dir (localCheckpoint): eight production
    * queries start from this aggregate, so the lineitem scan+agg runs
    * once per session — the same explicit materialized-intermediate
    * pattern as Clustering.componentsFor, identical results.
    */
  private val cellsCache =
    new graft.util.Memo[(String, String), DataFrame]

  def cells(spark: SparkSession, dir: String): DataFrame =
    cellsCache.getOrElseUpdate((spark.sparkContext.applicationId, dir),
      Tables(spark, dir, "lineitem")
        .select(
          (col("l_orderkey") % W).as("x"),
          (col("l_partkey") % H).as("y"),
          scoreCol.as("score"))
        .withColumn("poly", ((col("x") * H) + col("y")) % 5)
        .groupBy("x", "y", "poly")
        .agg(max("score").as("score"), count(lit(1)).as("w"))
        .seal())

  val cellsCte: String =
    """cells AS (
      |  SELECT (l_orderkey % 97) AS x, (l_partkey % 89) AS y,
      |         (((l_orderkey % 97) * 89 + (l_partkey % 89)) % 5) AS poly,
      |         MAX((((l_orderkey * 2654435761) + (l_partkey * 40503)) % 1000) / 1000.0) AS score,
      |         COUNT(*) AS w
      |  FROM lineitem
      |  GROUP BY 1, 2, 3
      |)""".stripMargin

  /** Positive cells only (the clustering/threshold world). */
  def positives(spark: SparkSession, dir: String): DataFrame =
    cells(spark, dir).filter(col("score") >= lit(Threshold))

  val positivesCte: String =
    s"""pos AS (
       |  SELECT x, y, poly, score, w FROM cells WHERE score >= $Threshold
       |)""".stripMargin

  /** OSM-node analogue derived from orders: lon/lat points. */
  def nodes(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        (lit(-180.0) + (col("o_orderkey") % 36000) / lit(100.0)).as("lon"),
        (lit(-85.0) + (col("o_custkey") % 17000) / lit(100.0)).as("lat"),
        (col("o_orderkey") % W).as("nx"),
        (col("o_custkey") % H).as("ny"))

  val nodesCte: String =
    """nodes AS (
      |  SELECT (-180.0 + (o_orderkey % 36000) / 100.0) AS lon,
      |         (-85.0 + (o_custkey % 17000) / 100.0) AS lat,
      |         (o_orderkey % 97) AS nx, (o_custkey % 89) AS ny
      |  FROM ford
      |)""".stripMargin

  /** lon/lat point per lineitem (the deg2num input world). */
  def points(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        (lit(-180.0) + (col("l_orderkey") % 36000) / lit(100.0)).as("lon"),
        (lit(-85.0) + (col("l_partkey") % 17000) / lit(100.0)).as("lat"))

  val pointsCte: String =
    """points AS (
      |  SELECT l_orderkey, l_linenumber,
      |         (-180.0 + (l_orderkey % 36000) / 100.0) AS lon,
      |         (-85.0 + (l_partkey % 17000) / 100.0) AS lat
      |  FROM lineitem
      |)""".stripMargin
}
