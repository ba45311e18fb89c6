package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.GeoJson
import graft.tiles.{Clustering, GeoDerive, GeoQueries, GridOps}

/** The reference's end-to-end flow (run_entire_process.py:38-80) as one
  * composed Spark pipeline: enumerate search tiles inside the polygons,
  * order inference center-outwards, score (stub CNN), threshold,
  * cluster positives, drop clusters already mapped in OSM, and emit the
  * per-tile MapRoulette challenge file.
  *
  * Every stage is one of the audited SURVEY §2 operators — this is the
  * composition proof that the library covers the reference's whole
  * process, not just its pieces. All stages stay declarative; the only
  * driver-side iteration is the O(log d) clustering loop.
  */
object Pipeline {

  /** spark-submit entry: runMain graft.Pipeline <sfDir> <outDir>. */
  def main(args: Array[String]): Unit = {
    val Array(dir, outDir) = args
    val spark = GraftSession.local()
    val r = runEntireProcess(spark, dir, outDir)
    println(s"PIPELINE $r")
    spark.stop()
  }

  final case class Result(
      searchTiles: Long, scored: Long, positives: Long,
      clusters: Long, unmappedClusters: Long, challengeLines: Long,
      clusteredChallengeLines: Long)

  def runEntireProcess(spark: SparkSession, dir: String, outDir: String): Result = {
    // 1. polygon grid enumeration (process_city_shapes.py:146-171)
    val grid = GridOps.fillPolygons(spark)
    // 2. inference ordering + stub scoring (solardb.py:215, run_inference.py:95)
    val scored = GeoQueries.a19InferenceScored(spark, dir)
    // 3. threshold + clustering of the full positive set (run_inference.py:21)
    val clusters = Clustering.componentsFor(spark, dir)
    // 4. clusters not containing an existing OSM node (maproulette.py:69)
    val unmapped = GeoQueries.a13SpatialAntijoin(spark, dir)
    // 5. per-positive-tile challenge GeoJSON for unmapped clusters
    val keep = clusters.join(
      unmapped.select("cluster_id"), Seq("cluster_id"), "left_semi")
    val lines = GeoQueries.a14TileGeojson(spark, dir)
      .join(keep.select("x", "y"), Seq("x", "y"), "left_semi")
      .select("geojson")
    GeoJson.writeChallengeLines(lines, s"$outDir/challenge")
    // 6. clustered variant: one challenge document per unmapped cluster
    // with its assembled outline rings (maproulette.py:36-66,91-99)
    GeoJson.writeChallengeLines(
      GeoQueries.clusteredChallenge(spark, dir).select("geojson"),
      s"$outDir/challenge_clustered")

    Result(
      searchTiles = grid.count(),
      scored = scored.count(),
      positives = GeoDerive.positives(spark, dir).count(),
      clusters = clusters.select("cluster_id").distinct().count(),
      unmappedClusters = unmapped.count(),
      challengeLines = spark.read.text(s"$outDir/challenge").count(),
      clusteredChallengeLines = spark.read.text(s"$outDir/challenge_clustered").count())
  }
}
